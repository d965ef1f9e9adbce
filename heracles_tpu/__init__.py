"""Heracles-TPU: harmonic-space statistics on the sphere, TPU-native.

A from-scratch JAX/XLA framework with the capabilities of the reference
Heracles library (catalogues -> maps -> alms -> angular power spectra ->
mixing matrices -> jackknife covariances), designed for TPU: batched ring
FFTs + fused Wigner scans for the SHT, device-resident scatter map-making,
and `jax.sharding` meshes for multi-chip scaling.

Public API parity: reference ``heracles/__init__.py:23-79``.
"""

__version__ = "0.1.0"
__version_tuple__ = (0, 1, 0)


def _enable_compile_cache():
    """Persistent XLA compilation cache (measured 2x cold-start wins).

    The SHT/grid kernels compile in ~10-60 s on remote TPU backends;
    the persistent cache reuses the compiled executables across
    processes.  Respects an existing user configuration
    (JAX_COMPILATION_CACHE_DIR or an explicit jax.config update);
    HERACLES_TPU_COMPILE_CACHE=0 disables.
    """
    import os

    if os.environ.get("HERACLES_TPU_COMPILE_CACHE", "").strip() == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is not None:
            return
        cache = os.environ.get(
            "HERACLES_TPU_CACHE", "/tmp/heracles_tpu_cache"
        )
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(cache, "xla_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from .catalog import (
    ArrayCatalog,
    Catalog,
    CatalogBase,
    CatalogPage,
    CatalogView,
    FitsCatalog,
    FootprintFilter,
    InvalidValueFilter,
    fsky_from_visibility,
)
from .core import (
    ExceptionExplainer,
    TocDict,
    external_dependency_explainer,
    toc_filter,
    toc_match,
    update_metadata,
)
from .fields import (
    ComplexField,
    Ellipticities,
    Field,
    Positions,
    ScalarField,
    Shears,
    Spin2Field,
    Visibility,
    Weights,
    get_masks,
)
from .io import (
    AlmFits,
    ClsFits,
    FitsDict,
    MapFits,
    MmsFits,
    read,
    read_alms,
    read_maps,
    read_vmap,
    write,
    write_alms,
    write_maps,
)
from .mapper import Mapper
from .mappers import DiscreteMapper, HealpixMapper
from .mapping import map_catalogs, transform
from .progress import NoProgress, Progress
from .result import Result, binned
from .transforms import cl2corr, corr2cl
from .twopoint import (
    alm2cl,
    angular_power_spectra,
    angular_power_spectra_samples,
    apply_mixing_matrix,
    debias_cls,
    invert_mixing_matrix,
    mixing_matrices,
)
from .unmixing import naturalspice

__all__ = [
    "__version__",
    "__version_tuple__",
    "AlmFits",
    "ArrayCatalog",
    "Catalog",
    "CatalogBase",
    "CatalogPage",
    "CatalogView",
    "ClsFits",
    "ComplexField",
    "DiscreteMapper",
    "Ellipticities",
    "ExceptionExplainer",
    "Field",
    "FitsCatalog",
    "FitsDict",
    "FootprintFilter",
    "HealpixMapper",
    "InvalidValueFilter",
    "MapFits",
    "Mapper",
    "MmsFits",
    "NoProgress",
    "Positions",
    "Progress",
    "Result",
    "ScalarField",
    "Shears",
    "Spin2Field",
    "TocDict",
    "Visibility",
    "Weights",
    "alm2cl",
    "angular_power_spectra",
    "angular_power_spectra_samples",
    "apply_mixing_matrix",
    "binned",
    "cl2corr",
    "corr2cl",
    "debias_cls",
    "external_dependency_explainer",
    "fsky_from_visibility",
    "get_masks",
    "invert_mixing_matrix",
    "map_catalogs",
    "mixing_matrices",
    "naturalspice",
    "read",
    "read_alms",
    "read_maps",
    "read_vmap",
    "toc_filter",
    "toc_match",
    "transform",
    "update_metadata",
    "write",
    "write_alms",
    "write_maps",
]
