from bbocr_tpu.server.http import App, Request, Response, SSEResponse

__all__ = ["App", "Request", "Response", "SSEResponse"]
