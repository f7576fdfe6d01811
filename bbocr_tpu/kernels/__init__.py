from bbocr_tpu.kernels.preprocess_pallas import (
    blur3_u8_pallas,
    enhance_u8_pallas,
    pallas_available,
    unsharp_u8_pallas,
)

__all__ = [
    "blur3_u8_pallas",
    "enhance_u8_pallas",
    "unsharp_u8_pallas",
    "pallas_available",
]
