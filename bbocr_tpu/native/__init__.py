"""Native (C++) host-side runtime pieces, loaded via ctypes.

Built lazily with g++ into ``<pkg>/native/build/``; a pure-numpy fallback
keeps the framework importable where no toolchain exists.
"""

from bbocr_tpu.native.loader import (
    connected_components,
    extract_quads_native,
    native_available,
)

__all__ = ["connected_components", "extract_quads_native", "native_available"]
