from sbmc_tpu.utils.image import crop_like, tonemap  # noqa: F401
