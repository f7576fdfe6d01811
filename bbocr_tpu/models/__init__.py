from bbocr_tpu.models.charset import EN_CHARSET, Charset
from bbocr_tpu.models.craft import CRAFT
from bbocr_tpu.models.crnn import CRNN

__all__ = ["CRAFT", "CRNN", "Charset", "EN_CHARSET"]
