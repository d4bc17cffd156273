"""tracs_tpu — a TPU-native transmission-distance engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the TRACS
pipeline (reference: gtonkinhill/tracs): it estimates pairwise transmission
distances between bacterial / viral / metagenomic samples by

  1. aligning reads against one or more reference genomes (``align`` stage,
     host-side orchestration of external aligners),
  2. converting pileups into coverage-aware posterior allele calls with an
     empirical-Bayes Dirichlet-multinomial model (``models.dirichlet``),
  3. computing all-pairs SNP distances over bit-packed one-hot alignments on
     the TPU MXU/VPU (``ops.pairsnp``),
  4. converting SNP + sampling-date differences into direct-transmission
     probabilities and the expected number of intermediate hosts
     (``models.transcluster``), and
  5. grouping samples into transmission clusters (``stages.cluster``).

Precision policy
----------------
x64 is enabled globally: the transcluster and Dirichlet-multinomial numerics
require float64 to hit the reference golden values at 1e-6 tolerance
(cf. reference tests/test_llk.py:27-28).  Those run on the JAX CPU backend.
All TPU device kernels use explicit 8/16/32-bit dtypes and never place f64
on the accelerator.
"""

import os

import jax

# The float64 model numerics (transcluster, Dirichlet-multinomial) run on the
# JAX CPU backend; make sure one exists even when the environment pins
# JAX_PLATFORMS to a TPU plugin.  Env mutation is not enough: some
# environments import jax from sitecustomize before user code runs, latching
# the config — so update the config directly (safe until backends initialise).
_REQUESTED_PLATFORM = None  # first entry of an explicit JAX_PLATFORMS, if any
try:
    _platforms = jax.config.jax_platforms
    if _platforms and "cpu" not in _platforms.split(","):
        _REQUESTED_PLATFORM = _platforms.split(",")[0]
        jax.config.update("jax_platforms", _platforms + ",cpu")
except Exception:  # pragma: no cover - backends already initialised
    pass


def warn_if_platform_fell_back() -> None:
    """Warn (loudly) when an explicitly requested accelerator platform
    failed to initialise and jax silently fell back to the cpu entry this
    module appended.  LAZY: only inspects backends that already
    initialised — a host-only CLI command (plot, cluster, doctor) must
    not pay accelerator-init latency just for this check.  The fallback
    itself is kept because the f64 model numerics need a cpu backend to
    exist alongside the accelerator."""
    if not _REQUESTED_PLATFORM:
        return
    try:  # private, so fail-safe: no check beats a forced backend init
        from jax._src import xla_bridge as _xb

        initialised = bool(getattr(_xb, "_backends", None))
    except Exception:  # pragma: no cover - jax internals moved
        initialised = False
    if initialised and jax.default_backend() == "cpu":
        import logging

        logging.getLogger(__name__).warning(
            "JAX_PLATFORMS requested %r but the '%s' backend failed to "
            "initialise — running on CPU. Device kernels will be slow.",
            _REQUESTED_PLATFORM, _REQUESTED_PLATFORM,
        )

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: first-compile latency on this platform is
# high and flaky (remote compile service); cache compiled executables across
# processes.  Disable with TRACS_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("TRACS_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "TRACS_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/tracs_tpu/jax")
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"

from tracs_tpu.ops.packing import (  # noqa: E402
    PackedAlignment,
    pack_sequences,
    pack_fasta,
    iupac_code_for_mask,
)
from tracs_tpu.ops.pairsnp import pairsnp, snp_distance_dense  # noqa: E402
from tracs_tpu.models.transcluster import (  # noqa: E402
    lprob_k_given_N,
    trans_dist,
    calculate_trans_prob,
)
from tracs_tpu.models.dirichlet import (  # noqa: E402
    find_dirichlet_priors,
    calculate_posteriors,
)

__all__ = [
    "PackedAlignment",
    "pack_sequences",
    "pack_fasta",
    "iupac_code_for_mask",
    "pairsnp",
    "snp_distance_dense",
    "lprob_k_given_N",
    "trans_dist",
    "calculate_trans_prob",
    "find_dirichlet_priors",
    "calculate_posteriors",
    "__version__",
]
