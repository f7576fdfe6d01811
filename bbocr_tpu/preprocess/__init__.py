from bbocr_tpu.preprocess.chain import (
    BOOK_COVER_STEPS,
    preprocess_for_book_cover,
    preprocess_for_book_cover_batch,
)
from bbocr_tpu.preprocess.autocrop import auto_crop_text_region, central_edge_crop

__all__ = [
    "BOOK_COVER_STEPS",
    "preprocess_for_book_cover",
    "preprocess_for_book_cover_batch",
    "auto_crop_text_region",
    "central_edge_crop",
]
