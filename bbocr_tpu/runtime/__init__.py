from bbocr_tpu.runtime.engine import EngineConfig, OCREngine

__all__ = ["EngineConfig", "OCREngine"]
