from setuptools import find_packages, setup

setup(
    name="deep_cartograph_tpu",
    version="0.1.0",
    description=(
        "TPU-native framework for mapping MD trajectories onto learned "
        "collective variables (JAX/XLA/Pallas)"
    ),
    packages=find_packages(include=["deep_cartograph_tpu*"]),
    python_requires=">=3.10",
    entry_points={
        "console_scripts": [
            "deep_carto_tpu = deep_cartograph_tpu.cli:main",
        ]
    },
)
