from bbocr_tpu.pricing.aggregator import DEFAULT_PROVIDERS, aggregate_offers

__all__ = ["DEFAULT_PROVIDERS", "aggregate_offers"]
