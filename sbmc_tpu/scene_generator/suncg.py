"""SunCG indoor-scene conversion (legacy placeholder).

The reference ships an unmaintained SunCG converter
(sbmc/scene_generator/suncg.py) that is explicitly disabled in its data
generator (reference: scripts/generate_training_data.py:99-103). The SunCG
dataset is no longer distributed, so this framework keeps only this
documented stub for API-surface parity; the supported content generator is
:class:`sbmc_tpu.scene_generator.OutdoorSceneGenerator`.
"""

__all__ = ["SunCGConverter", "SunCGSceneGenerator"]


class SunCGConverter:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "SunCG support is legacy and unavailable (the dataset is no "
            "longer distributed); use OutdoorSceneGenerator.")


class SunCGSceneGenerator:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "SunCG support is legacy and unavailable (the dataset is no "
            "longer distributed); use OutdoorSceneGenerator.")
