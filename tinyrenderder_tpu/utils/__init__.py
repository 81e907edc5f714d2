from tinyrenderder_tpu.utils import tga  # noqa: F401
