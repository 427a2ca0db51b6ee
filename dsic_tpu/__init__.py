"""dsic_tpu — TPU-native domain-specific learned image compression.

A brand-new JAX/XLA/Pallas framework for satellite-imagery compression with the
capabilities of the reference project Dimitrinov74/Domain-Specific-Image-Compression:
a convolutional autoencoder with GDN/IGDN nonlinearities and a Student-t hyperprior
entropy model, a real rANS entropy codec (TPU-computed CDF tables + host-side C++
coder), a Sentinel-2 band-merge/patch data pipeline, and a full RD/BD evaluation
suite.

Layout is NHWC throughout (TPU-native); parallelism is expressed with
``jax.sharding.Mesh`` + ``jax.jit`` shardings (data-parallel batch sharding and
optional spatial partitioning for full-scene tiles).

Subpackages
-----------
ops       Fused numerics: GDN/IGDN (Pallas), quantizers, priors, MS-SSIM, padding.
models    Flax modules: analysis/synthesis/hyper transforms, CompressionModel.
codec     Entropy coding: CDF tables (JAX) + C++ rANS coder + bitstream container.
train     Train state, jitted train/eval steps, trainer loop, lambda sweep.
parallel  Device mesh construction and sharding rules.
data      Host-side dataset pipeline, Sentinel-2 band merge, synthetic data.
eval      RD curves, Bjontegaard deltas, JPEG baselines, visual comparisons.
utils     Checkpointing (orbax), CSV metrics logging, image I/O.
"""

__version__ = "0.1.0"

# Platform override for subprocess-driven tooling (scripts/, CI smoke tests):
# the axon TPU plugin ignores the JAX_PLATFORMS env var, so forcing CPU from
# the environment needs an in-process config update BEFORE any backend use.
# DSIC_PLATFORM=cpu makes every `python -m dsic_tpu.*` entry point run on CPU
# (e.g. so the reproduce_baseline.sh dry-run smoke test cannot contend with a
# TPU training job).
import os as _os

if _os.environ.get("DSIC_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DSIC_PLATFORM"])
