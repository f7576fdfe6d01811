from bbocr_tpu.utils.env import sync_platform_from_env as _sync

_sync()  # honor JAX_PLATFORMS=cpu before any device use

from bbocr_tpu.runtime.engine import EngineConfig, OCREngine  # noqa: E402

__all__ = ["EngineConfig", "OCREngine"]
