"""bbocr_tpu — TPU-native book-photo OCR + metadata framework.

A ground-up rebuild of the capabilities of BB-OCR (book photos -> OpenCV-style
preprocessing -> text detection/recognition -> structured JSON metadata ->
pricing lookup + human review) designed for TPU hardware:

- ``ops/`` / ``kernels/``: image ops as jittable JAX/XLA programs and Pallas
  TPU kernels (the reference's OpenCV C++ chain,
  reference ``pipeline_demo/ocr_testing/preprocessing/image_preprocessor.py``).
- ``models/``: CRAFT text detector + CRNN (CNN-BiLSTM-CTC) recognizer as JAX
  forward passes (the reference's EasyOCR/libtorch stack).
- ``decode/``: CTC decode on device; score-map -> box extraction with a native
  C++ connected-components labeler.
- ``parallel/`` / ``runtime/``: device-mesh sharding (pjit/shard_map), static
  shape bucketing, batched engine.
- ``extract/``, ``llm/``, ``pricing/``, ``server/``, ``cli/``: the metadata
  extraction contract, LLM provider clients, pricing aggregation, and the
  scanner web service, byte-compatible with the reference's API surface.
"""

from bbocr_tpu.version import __version__

__all__ = ["__version__"]
