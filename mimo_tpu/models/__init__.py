from mimo_tpu.models import layers  # noqa: F401
