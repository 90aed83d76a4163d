"""Native tokenizer kernels (C++ CPython extension).

Build with `python setup.py build_ext --inplace` at the repo root. When the
compiled module is absent (or FADERNETS_NO_NATIVE=1), callers fall back to
the pure-Python implementations — outputs are bit-identical either way
(tests/test_native.py)."""
import importlib
import os

fadertok = None
HAVE_NATIVE = False

if os.environ.get("FADERNETS_NO_NATIVE") != "1":
    try:
        fadertok = importlib.import_module(
            "music_fader_nets_tpu.native.fadertok")
        HAVE_NATIVE = True
    except ImportError:
        fadertok = None
        HAVE_NATIVE = False
