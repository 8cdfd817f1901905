import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "tpu_sparse_lu.utils._symcore",
            sources=["tpu_sparse_lu/utils/_symcore.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ]
)
