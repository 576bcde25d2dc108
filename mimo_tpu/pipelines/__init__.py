from mimo_tpu.pipelines.context import compute_windows  # noqa: F401
