from mimo_tpu.schedulers.ddim import DDIM  # noqa: F401
