#!/usr/bin/env python
"""Download a remote artifact (pretrained models, demo data, eval renders).

The reference's artifact-fetch gateway (reference: scripts/download.py:1-37,
driven by its Makefile demo/eval targets with ``$(REMOTE)/pretrained_models
.zip`` etc.). Same CLI: ``download.py <src-url> <dst-path>``; skips the
download when the destination already exists, creates parent directories,
and unpacks ``.zip`` archives next to the destination when ``--extract`` is
passed (the reference Makefile pipes into ``unzip`` separately).

Uses urllib (stdlib) instead of the reference's ``wget`` package so no
extra dependency is needed; on an air-gapped host the failure is reported
cleanly with a pointer to drop the file in place manually.
"""

import argparse
import os
import sys
import urllib.error
import urllib.request
import zipfile


def download(src, dst, extract=False):
    dst = os.path.abspath(dst)
    d = os.path.dirname(dst)
    if d:
        os.makedirs(d, exist_ok=True)
    if os.path.exists(dst):
        print(dst, "already exists, skipping download.")
    else:
        print("Downloading", src, "to", dst)
        tmp = dst + ".part"
        try:
            with urllib.request.urlopen(src) as r, open(tmp, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(tmp, dst)
        except (urllib.error.URLError, OSError) as e:
            if os.path.exists(tmp):
                os.remove(tmp)
            print("Download failed (%s). If this host has no network "
                  "egress, place the file at %s manually." % (e, dst),
                  file=sys.stderr)
            raise SystemExit(1)
    if extract and dst.endswith(".zip"):
        print("Extracting", dst)
        with zipfile.ZipFile(dst) as z:
            z.extractall(os.path.dirname(dst))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="url of the file to download.")
    parser.add_argument("dst", help="path to the output")
    parser.add_argument("--extract", action="store_true",
                        help="unzip .zip archives after download.")
    args = parser.parse_args()
    download(args.src, args.dst, extract=args.extract)
