from bbocr_tpu.decode.ctc import ctc_greedy_decode
from bbocr_tpu.decode.boxes import (
    DetectionParams,
    extract_boxes,
    extract_boxes_masked,
    sort_reading_order,
    split_multiline_quads,
)

__all__ = [
    "ctc_greedy_decode",
    "DetectionParams",
    "extract_boxes",
    "extract_boxes_masked",
    "split_multiline_quads",
    "sort_reading_order",
]
