from bbocr_tpu.models.charset import EN_CHARSET, Charset
from bbocr_tpu.models.craft import CRAFT, CRAFTLite
from bbocr_tpu.models.crnn import CRNN

__all__ = ["CRAFT", "CRAFTLite", "CRNN", "Charset", "EN_CHARSET"]
