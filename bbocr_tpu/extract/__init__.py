from bbocr_tpu.extract.schema import METADATA_SCHEMA, empty_metadata, validate_metadata
from bbocr_tpu.extract.jsonrepair import repair_and_parse
from bbocr_tpu.extract.prompt import build_prompt, PROMPT_TEMPLATE
from bbocr_tpu.extract.heuristics import heuristic_extract
from bbocr_tpu.extract.extractor import BookMetadataExtractor

__all__ = [
    "METADATA_SCHEMA",
    "empty_metadata",
    "validate_metadata",
    "repair_and_parse",
    "build_prompt",
    "PROMPT_TEMPLATE",
    "heuristic_extract",
    "BookMetadataExtractor",
]
