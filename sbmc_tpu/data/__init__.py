from sbmc_tpu.data.datasets import (  # noqa: F401
    TilesDataset,
    FullImagesDataset,
    MultiSampleCountDataset,
)
from sbmc_tpu.data.loader import Loader, collate  # noqa: F401
from sbmc_tpu.data import bin_format  # noqa: F401
