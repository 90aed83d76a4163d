"""Build for the native tokenizer extension.

    python setup.py build_ext --inplace

drops `fadertok*.so` into music_fader_nets_tpu/native/; the tokenizer
auto-dispatches to it (music_fader_nets_tpu/native/__init__.py) and falls
back to pure Python when absent.
"""
import numpy
from setuptools import Extension, setup

setup(
    name="music_fader_nets_tpu",
    version="0.1.0",
    packages=["music_fader_nets_tpu"],
    ext_modules=[
        Extension(
            "music_fader_nets_tpu.native.fadertok",
            sources=["native/fadertok.cc"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
