"""Run the scanner service: python -m bbocr_tpu.server [--port 8000]."""

import argparse

from bbocr_tpu.server.app import create_app


def main():
    p = argparse.ArgumentParser(description="bbocr_tpu scanner service")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--books-dir", default=None)
    args = p.parse_args()
    service = create_app(data_dir=args.data_dir, books_dir=args.books_dir)
    service.app.run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
