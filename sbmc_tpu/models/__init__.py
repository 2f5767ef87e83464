from sbmc_tpu.models.multisteps import Multisteps  # noqa: F401
from sbmc_tpu.models.kpcn import KPCN  # noqa: F401
from sbmc_tpu.models.lbf import LBF  # noqa: F401
