#!/usr/bin/env python
"""The paper's motivating toy experiment: scatter (splat) vs gather kernels
on a synthetic 1-spp anti-aliasing task with radiance outliers (reference:
scripts/figures/scatter_vs_gather.py, modernized and self-contained).

A tiny conv net predicts 3x3 kernels from jittered samples of a step-edge
image contaminated with rare very-bright outliers. Gather kernels must
*pull* energy and cannot cheaply suppress an outlier at their own pixel;
splat kernels let each sample decide where its energy goes, so outliers
learn to spread themselves to nothing. The script trains both variants and
writes a CSV of loss curves plus PNG strips.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def make_batch(rng, bs=4, spp=4, h=64, w=64, outlier_p=0.005):
    """Jittered samples of a random step-edge/checker image with outliers."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    imgs, samples, coords = [], [], []
    for _ in range(bs):
        freq = rng.uniform(0.05, 0.2, 2)
        phase = rng.uniform(0, 2 * np.pi, 2)
        target = (np.sin(freq[0] * xs * 2 * np.pi + phase[0])
                  * np.sin(freq[1] * ys * 2 * np.pi + phase[1]) > 0)
        target = target.astype(np.float32)
        sp, co = [], []
        for _s in range(spp):
            dx = rng.rand(h, w)
            dy = rng.rand(h, w)
            val = (np.sin(freq[0] * (xs + dx) * 2 * np.pi + phase[0])
                   * np.sin(freq[1] * (ys + dy) * 2 * np.pi + phase[1]) > 0
                   ).astype(np.float32)
            out_mask = rng.rand(h, w) < outlier_p
            val = np.where(out_mask, rng.uniform(50, 200, (h, w)), val)
            sp.append(val)
            co.append(np.stack([dx, dy], 0))
        imgs.append(target)
        samples.append(np.stack(sp, 0))
        coords.append(np.stack(co, 0))
    return (np.stack(imgs)[:, None],              # [bs, 1, h, w]
            np.stack(samples)[:, :, None],        # [bs, spp, 1, h, w]
            np.stack(coords))                     # [bs, spp, 2, h, w]


def main(args):
    import csv

    import jax
    import jax.numpy as jnp
    import optax

    from sbmc_tpu.nn import ConvChain, kernel_apply
    from sbmc_tpu.utils.image import crop_like

    import flax.linen as nn

    class Toy(nn.Module):
        splat: bool
        ksize: int = 3

        @nn.compact
        def __call__(self, samples, coords):
            bs, spp, _, h, w = samples.shape
            feats = jnp.concatenate(
                [jnp.log10(1.0 + samples), coords], axis=2)
            flat = feats.reshape(bs * spp, -1, h, w).transpose(0, 2, 3, 1)
            kernels = ConvChain(self.ksize ** 2, width=args.width, depth=3,
                                ksize=3, pad=True)(flat)
            kernels = kernels.transpose(0, 3, 1, 2)
            data = samples.reshape(bs * spp, 1, h, w)
            out, _ = kernel_apply(data, kernels, softmax=True,
                                  splat=self.splat)
            out = out.reshape(bs, spp, 1, h, w).mean(1)
            k = (self.ksize - 1) // 2
            return out[..., k:-k, k:-k]

    rng = np.random.RandomState(0)
    results = {}
    for splat in (True, False):
        name = "splat" if splat else "gather"
        model = Toy(splat=splat)
        tgt0, smp0, crd0 = make_batch(rng)
        params = model.init(jax.random.PRNGKey(0), jnp.array(smp0),
                            jnp.array(crd0))
        tx = optax.adam(args.lr)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, smp, crd, tgt):
            def loss_fn(p):
                out = model.apply(p, smp, crd)
                return jnp.mean((out - crop_like(tgt, out)) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        losses = []
        for it in range(args.steps):
            tgt, smp, crd = make_batch(rng)
            params, opt, loss = step(params, opt, jnp.array(smp),
                                     jnp.array(crd), jnp.array(tgt))
            losses.append(float(loss))
            if it % 20 == 0:
                print(f"{name} step {it}: loss {losses[-1]:.5f}")
        results[name] = losses

        out = np.array(model.apply(params, jnp.array(smp0),
                                   jnp.array(crd0)))
        import imageio.v2 as imageio
        os.makedirs(args.output, exist_ok=True)
        c = (out.shape[-1] != smp0.shape[-1]) and \
            (smp0.shape[-1] - out.shape[-1]) // 2 or 0
        low = smp0[0].mean(0)[0]
        if c:
            low = low[c:-c, c:-c]
        strip = np.concatenate(
            [np.clip(low, 0, 1), np.clip(out[0, 0], 0, 1)], 1)
        imageio.imwrite(os.path.join(args.output, f"{name}.png"),
                        (strip * 255).astype(np.uint8))

    with open(os.path.join(args.output, "losses.csv"), "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["step", "splat", "gather"])
        for i, (a, b) in enumerate(zip(results["splat"], results["gather"])):
            writer.writerow([i, a, b])
    print("final: splat %.5f gather %.5f" %
          (np.mean(results["splat"][-10:]), np.mean(results["gather"][-10:])))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("output", help="output folder")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--width", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    main(parser.parse_args())
