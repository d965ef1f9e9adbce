"""INI-config-driven command line interface.

Parity with ``/root/reference/heracles/cli.py``: the ``heracles-tpu``
command (also ``python -m heracles_tpu``) provides the four pipeline
stages ``maps``, ``alms``, ``spectra``, ``mixmats``, driven by the same
INI schema:

* a ``defaults`` section applied everywhere (``mapper = healpix``);
* namespaced subsections ``fields:NAME``, ``catalogs:NAME``,
  ``spectra:NAME``;
* converters ``getlist``/``getdict``/``getpath``/``getfilter`` (filters
  use ``...`` wildcards matching the tuple-key system);
* bins of the form ``<size> <spacing> [<weights>]`` with linear/log/
  sqrt/log1p spacings and ``2l+1`` / ``l(l+1)`` weights.

State crosses stages via FITS files, so pipelines are restartable and
trivially sharded by selection/stage across jobs.
"""

from __future__ import annotations

import argparse
import configparser
import logging
import os
from collections.abc import Mapping
from typing import Any

import numpy as np

# field type names -> implementations (resolvable via pkgutil.resolve_name)
FIELD_TYPES = {
    "positions": "heracles_tpu.fields:Positions",
    "shears": "heracles_tpu.fields:Shears",
    "visibility": "heracles_tpu.fields:Visibility",
    "weights": "heracles_tpu.fields:Weights",
}


def getlist(value):
    """Multi-line option value -> list of stripped non-empty lines."""
    return list(filter(None, map(str.strip, value.splitlines())))


def getdict(value):
    """Multi-line 'KEY = VALUE' option value -> dict."""
    out = {}
    for line in map(str.strip, value.splitlines()):
        if not line:
            continue
        key, sep, val = line.partition("=")
        if sep != "=":
            raise ValueError(f"Invalid value: {line!r} (expected 'KEY = VALUE')")
        out[key.rstrip()] = val.lstrip()
    return out


def getchoice(value, choices):
    """Value from a fixed set of options."""
    try:
        return choices[value]
    except KeyError:
        expected = ", ".join(map(repr, choices))
        raise ValueError(f"Invalid value: {value!r} (expected {expected})") from None


def getpath(value):
    """Path with user/env expansion."""
    return os.path.expanduser(os.path.expandvars(value))


def getfilter(value):
    """Multi-line comma-separated include/exclude patterns ('...' wildcards)."""
    out = []
    for row in getlist(value):
        item = []
        for part in map(str.strip, row.split(",")):
            if part == "...":
                item.append(...)
            elif part.isdigit():
                item.append(int(part))
            else:
                item.append(part)
        out.append(tuple(item))
    return out


class ConfigParser(configparser.ConfigParser):
    """ConfigParser with heracles converters and subsection helpers."""

    _UNSET = configparser._UNSET

    def __init__(self):
        super().__init__(
            defaults={"mapper": "healpix"},
            dict_type=dict,
            allow_no_value=False,
            delimiters=("=",),
            comment_prefixes=("#",),
            inline_comment_prefixes=("#",),
            strict=True,
            empty_lines_in_values=False,
            default_section="defaults",
            interpolation=None,
            converters={
                "list": getlist,
                "dict": getdict,
                "path": getpath,
                "filter": getfilter,
            },
        )

    def getchoice(self, section, option, choices, *, raw=False, vars=None,
                  fallback=_UNSET):
        try:
            value = self.get(section, option, raw=False, vars=None)
        except (configparser.NoSectionError, configparser.NoOptionError):
            if fallback is not self._UNSET:
                return fallback
            raise
        return getchoice(value, choices)

    def sections(self, prefix=None):
        sections = super().sections()
        if prefix is not None:
            sections = [s for s in sections if s.startswith(prefix)]
        return sections

    def subsections(self, group):
        sections = self.sections(f"{group}:")
        return {s.rpartition(":")[-1].strip(): s for s in sections}


def mapper_from_config(config, section):
    """Mapper instance from a config section (none/healpix/discrete)."""
    choices = {"none": "none", "healpix": "healpix", "discrete": "discrete"}
    mapper = config.getchoice(section, "mapper", choices)
    if mapper == "healpix":
        from .mappers import HealpixMapper

        nside = config.getint(section, "nside")
        lmax = config.getint(section, "lmax", fallback=None)
        deconvolve = config.getboolean(section, "deconvolve", fallback=None)
        device_maps = config.getboolean(section, "device_maps",
                                        fallback=None)
        if device_maps is None:
            # on an accelerator keep maps/alms resident by default: the
            # host<->device boundary costs ~GBs per stage at production
            # nside (explicit device_maps = true/false overrides)
            import jax

            device_maps = jax.default_backend() == "tpu"
        dd = config.getboolean(section, "dd", fallback=None)
        iterations = config.getint(section, "iterations", fallback=0)
        return HealpixMapper(nside, lmax, deconvolve=deconvolve,
                             device_maps=device_maps, dd=dd,
                             iterations=iterations)
    if mapper == "discrete":
        from .mappers import DiscreteMapper

        lmax = config.getint(section, "lmax", fallback=None)
        epsilon = config.getfloat(section, "epsilon", fallback=None)
        method = config.get(section, "method", fallback="auto")
        return DiscreteMapper(lmax, epsilon=epsilon, method=method)
    return None


def field_from_config(config, section):
    """Field instance from a config section."""
    from pkgutil import resolve_name

    type_ = config.getchoice(section, "type", FIELD_TYPES)
    if isinstance(type_, str):
        try:
            cls = resolve_name(type_)
        except (ValueError, ImportError, AttributeError) as exc:
            value = config.get(section, "type")
            raise RuntimeError(
                f"Internal error: field type {value!r} maps to type {type_!r}, "
                f"which raised the following error: {exc!s}"
            ) from None
    else:
        cls = type_
    mapper = mapper_from_config(config, section)
    columns = config.getlist(section, "columns", fallback=())
    mask = config.get(section, "mask", fallback=None)
    return cls(mapper, *columns, mask=mask)


def fields_from_config(config):
    """All fields from the ``fields:NAME`` sections."""
    sections = config.subsections("fields")
    return {
        name: field_from_config(config, section)
        for name, section in sections.items()
    }


def catalog_from_config(config, section, label=None, *, out=None):
    """Catalogue (views) from a config section.

    Supports per-catalogue or per-selection visibility maps, optional
    harmonic transform of visibilities, and numbered selections producing
    :class:`~heracles_tpu.catalog.CatalogView` instances.
    """
    from .catalog import FitsCatalog
    from .io import read_vmap

    source = config.getpath(section, "source")
    visibility = config.get(section, "visibility", fallback=None)
    visibility_transform = config.getboolean(
        section, "visibility-transform", fallback=False
    )
    visibility_lmax = config.getint(section, "visibility-lmax", fallback=None)
    if visibility and "\n" in visibility:
        visibility = config.getdict(section, "visibility")
    selections = config.getdict(section, "selections")

    base_catalog = FitsCatalog(source)
    base_catalog.label = label
    if isinstance(visibility, str):
        try:
            vmap = read_vmap(
                getpath(visibility),
                transform=visibility_transform,
                lmax=visibility_lmax,
            )
        except (TypeError, ValueError, OSError) as exc:
            raise ValueError(f"Cannot load visibility: {exc!s}") from None
        base_catalog.visibility = vmap
        del vmap

    if out is None:
        out = {}
    added = set()
    for key, where in selections.items():
        num = int(key)
        if out and num in out:
            raise ValueError(f"Duplicate selection: {num}")
        out[num] = base_catalog.where(where) if where else base_catalog
        added.add(num)

    if isinstance(visibility, Mapping):
        for key, value in visibility.items():
            num = int(key)
            if num not in added:
                raise ValueError(f"Invalid value: unknown selection '{num}'")
            try:
                vmap = read_vmap(
                    getpath(value),
                    transform=visibility_transform,
                    lmax=visibility_lmax,
                )
            except (TypeError, ValueError, OSError) as exc:
                raise ValueError(f"Cannot load visibility: {exc!s}") from None
            out[num].visibility = vmap
            del vmap
    return out


def catalogs_from_config(config):
    """All catalogues from the ``catalogs:NAME`` sections."""
    catalogs = {}
    for label, section in config.subsections("catalogs").items():
        catalog_from_config(config, section, label, out=catalogs)
    return catalogs


def bins_from_config(config, section):
    """Angular bin edges + weights from '<size> <spacing> [<weights>]'."""
    spacings = {
        "linear": (lambda x: x, lambda x: x),
        "log": (np.log10, lambda x: 10**x),
        "sqrt": (np.sqrt, np.square),
        "log1p": (np.log1p, np.expm1),
    }
    weights = {None, "2l+1", "l(l+1)"}

    bins = config.get(section, "bins", fallback="none")
    if bins == "none":
        return None, None
    binopts = bins.split()
    if not 2 <= len(binopts) <= 3:
        raise ValueError(
            f"{section}: bins should be of the form '<size> <spacing> [<weights>]'"
        )
    n = int(binopts[0])
    s = binopts[1]
    w = binopts[2] if len(binopts) > 2 else None
    if n < 2:
        raise ValueError(f"Invalid bin size '{n}' in section {section}")
    if s not in spacings:
        raise ValueError(f"Invalid bin spacing '{s}' in section {section}")
    if w is not None and w not in weights:
        raise ValueError(f"Invalid bin weights '{w}' in section {section}")
    lmin = config.getint(section, "lmin", fallback=1)
    lmax = config.getint(section, "lmax")
    op, inv = spacings[s]
    arr = inv(np.linspace(op(lmin), op(lmax + 1), n + 1))
    arr[0], arr[-1] = lmin, lmax + 1
    return arr, w


def spectrum_from_config(config, section):
    """kwargs dict for angular_power_spectra / mixing_matrices."""
    options = config[section]
    info: dict[str, Any] = {}
    if "lmax" in options:
        info["lmax"] = options.getint("lmax")
    if "l2max" in options:
        info["l2max"] = options.getint("l2max")
    if "l3max" in options:
        info["l3max"] = options.getint("l3max")
    if "include" in options:
        info["include"] = options.getfilter("include")
    if "exclude" in options:
        info["exclude"] = options.getfilter("exclude")
    if "debias" in options:
        info["debias"] = options.getboolean("debias")
    if "bins" in options:
        info["bins"] = bins_from_config(config, section)
    return info


def spectra_from_config(config):
    """(label, kwargs) pairs for every ``spectra:NAME`` section."""
    out = [
        (label, spectrum_from_config(config, section))
        for label, section in config.subsections("spectra").items()
    ]
    if not out:
        out = [(None, {})]
    return out


def configloader(path):
    """Load one or more INI files into a ConfigParser."""
    if isinstance(path, (str, os.PathLike)):
        path = (path,)
    config = ConfigParser()
    for p in path:
        with open(p) as fp:
            config.read_file(fp)
    return config


DEFAULT_LOADER = configloader


def _progress_obj(progress):
    if not progress:
        return None
    try:
        from .rich_progress import RichProgress

        return RichProgress()
    except Exception:
        return None


def map_all_selections(fields, config, logger, progress):
    """Yield map dicts per catalogue selection (on-the-fly, low memory)."""
    from .mapping import map_catalogs

    catalogs = catalogs_from_config(config)
    logger.info("fields %s", ", ".join(map(repr, fields)))
    for key, catalog in catalogs.items():
        logger.info(
            "%s%s",
            f"catalog {catalog.label!r}, " if catalog.label else "",
            f"selection {key}",
        )
        yield map_catalogs(
            fields,
            {key: catalog},
            parallel=True,
            progress=_progress_obj(progress),
        )


def load_all_maps(paths, logger):
    """Yield MapFits mappings from one or more paths."""
    from .io import MapFits

    if isinstance(paths, (str, os.PathLike)):
        paths = (paths,)
    for path in paths:
        logger.info("reading maps from %s", path)
        yield MapFits(path, clobber=False)


def maps(path, *, files, logger, loader=DEFAULT_LOADER, progress):
    """compute maps"""
    from .io import MapFits

    logger.info("reading configuration from %s", files)
    config = loader(files)
    fields = fields_from_config(config)
    itermaps = map_all_selections(fields, config, logger, progress)
    out = MapFits(path, clobber=True)
    for m in itermaps:
        logger.info("writing maps to %s", path)
        out.update(m)
        del m


def alms(path, *, files, maps=None, healpix_datapath=None, logger,
         loader=DEFAULT_LOADER, progress):
    """compute spherical harmonic coefficients

    Compute spherical harmonic coefficients (alms) from catalogues or
    maps.  For catalogue input, the maps for each selection are created
    in memory and discarded after its alms have been computed.
    """
    from .io import AlmFits
    from .mappers import HealpixMapper
    from .mapping import transform

    logger.info("reading configuration from %s", files)
    config = loader(files)
    if healpix_datapath is not None:
        HealpixMapper.DATAPATH = healpix_datapath
    fields = fields_from_config(config)
    if maps:
        itermaps = load_all_maps(maps, logger)
    else:
        itermaps = map_all_selections(fields, config, logger, progress)
    logger.info("writing alms to %s", path)
    out = AlmFits(path, clobber=True)
    for m in itermaps:
        logger.info("transforming %d maps", len(m))
        transform(fields, m, progress=_progress_obj(progress), out=out)
        del m


def chained_alms(alms):
    """ChainMap of AlmFits over multiple input files (or None)."""
    from collections import ChainMap

    from .io import AlmFits

    if alms is None:
        return None
    return ChainMap(*(AlmFits(a) for a in reversed(alms)))


def spectra(path, *, files, alms, alms2=None, logger, loader=DEFAULT_LOADER,
            progress):
    """compute angular power spectra"""
    from .io import ClsFits
    from .twopoint import angular_power_spectra

    logger.info("reading configuration from %s", files)
    config = loader(files)
    spectra_info = spectra_from_config(config)
    all_alms, all_alms2 = chained_alms(alms), chained_alms(alms2)
    out = ClsFits(path, clobber=True)
    total = 0
    logger.info("using %d set(s) of alms", len(all_alms))
    if all_alms2 is not None:
        logger.info("using %d set(s) of cross-alms", len(all_alms2))
    for label, info in spectra_info:
        logger.info(
            "computing %s spectra", repr(label) if label is not None else "all"
        )
        bins, weights = info.get("bins") or (None, None)
        angular_power_spectra(
            all_alms,
            all_alms2,
            lmax=info.get("lmax"),
            debias=info.get("debias", True),
            bins=bins,
            weights=weights,
            include=info.get("include"),
            exclude=info.get("exclude"),
            out=out,
        )
        logger.info("-> added %d spectra, total is now %d", len(out) - total,
                    len(out))
        total = len(out)
    logger.info("finished computing %d spectra", total)


def mixmats(path, *, files, alms, alms2=None, logger, loader=DEFAULT_LOADER,
            progress):
    """compute mixing matrices"""
    from .fields import get_masks
    from .io import MmsFits
    from .twopoint import angular_power_spectra, mixing_matrices

    logger.info("reading configuration from %s", files)
    config = loader(files)
    fields = fields_from_config(config)
    spectra_info = spectra_from_config(config)
    all_alms, all_alms2 = chained_alms(alms), chained_alms(alms2)
    out = MmsFits(path, clobber=True)
    total = 0
    for label, info in spectra_info:
        include, exclude = info.get("include"), info.get("exclude")
        include_masks = get_masks(
            fields, comb=2, include=include, exclude=exclude, append_eb=True
        )
        if not include_masks:
            logger.info(
                "missing masks for %s spectra, skipping...",
                repr(label) if label is not None else "all",
            )
            continue
        logger.info(
            "computing %s mask spectra for %s",
            repr(label) if label is not None else "all",
            ", ".join(map(str, include_masks)),
        )
        lmax, l2max, l3max = info.get("lmax"), info.get("l2max"), info.get("l3max")
        bins, weights = info.get("bins") or (None, None)
        mask_cls = angular_power_spectra(
            all_alms,
            all_alms2,
            lmax=l3max,
            debias=info.get("debias", True),
            include=include_masks,
        )
        logger.info(
            "computing %s mixing matrices from %d spectra",
            repr(label) if label is not None else "all",
            len(mask_cls),
        )
        mixing_matrices(
            fields,
            mask_cls,
            l1max=lmax,
            l2max=l2max,
            l3max=l3max,
            bins=bins,
            weights=weights,
            progress=_progress_obj(progress),
            out=out,
        )
        logger.info("-> added %d mixmats, total is now %d", len(out) - total,
                    len(out))
        total = len(out)
        del mask_cls
    logger.info("finished computing %d mixing matrices", total)


class MainFormatter(argparse.RawDescriptionHelpFormatter):
    """Formatter that keeps the order of arguments for usage."""

    def add_usage(self, usage, actions, groups, prefix=None):
        self.actions = actions
        super().add_usage(usage, actions, groups, prefix)

    def _format_actions_usage(self, actions, groups):
        return super()._format_actions_usage(self.actions, groups)


def main():
    """Entry point of the ``heracles-tpu`` command."""

    def add_command(func):
        name = func.__name__
        doc = func.__doc__.strip()
        help_, _, description = doc.partition("\n")
        parser = commands.add_parser(
            name,
            help=help_,
            description=description,
            parents=[cmd_parser],
            formatter_class=MainFormatter,
        )
        parser.set_defaults(cmd=func)
        return parser

    cmd_parser = argparse.ArgumentParser(add_help=False)
    cmd_parser.add_argument(
        "-c", "--config",
        help="configuration file (can be repeated)",
        metavar="<config>", action="append", dest="files",
    )
    cmd_parser.add_argument(
        "--no-progress", help="do not show progress bars",
        action="store_false", dest="progress",
    )

    main_parser = argparse.ArgumentParser(
        prog="heracles-tpu",
        epilog="TPU-native harmonic-space statistics on the sphere",
        formatter_class=MainFormatter,
    )
    main_parser.set_defaults(cmd=None)
    commands = main_parser.add_subparsers(
        title="commands", metavar="<command>",
        help="the processing step to carry out",
    )

    parser = add_command(maps)
    group = parser.add_argument_group("output")
    group.add_argument("path", help="output FITS file for maps",
                       metavar="<maps>")

    parser = add_command(alms)
    parser.add_argument("--healpix-datapath",
                        help="path to HEALPix data files (accepted for "
                             "compatibility; quadrature weights are computed)",
                        metavar="<path>")
    group = parser.add_argument_group("output")
    group.add_argument("path", help="output FITS file for alms",
                       metavar="<alms>")
    group = parser.add_argument_group("inputs")
    group.add_argument("maps", nargs="*", default=None,
                       help="input FITS file(s) for maps", metavar="<maps>")

    parser = add_command(spectra)
    group = parser.add_argument_group("output")
    group.add_argument("path", help="output FITS file for spectra",
                       metavar="<spectra>")
    group = parser.add_argument_group("inputs")
    group.add_argument("alms", nargs="+",
                       help="input FITS file(s) for alms", metavar="<alms>")
    group.add_argument("-X", nargs="+",
                       help="input FITS file(s) for cross-spectra",
                       metavar="<alms>", dest="alms2")

    parser = add_command(mixmats)
    group = parser.add_argument_group("output")
    group.add_argument("path", help="output FITS file for mixing matrices",
                       metavar="<mixmats>")
    group = parser.add_argument_group("inputs")
    group.add_argument("alms", nargs="+",
                       help="input FITS file(s) for alms", metavar="<alms>")
    group.add_argument("-X", nargs="+",
                       help="input FITS file(s) for cross-spectra",
                       metavar="<alms>", dest="alms2")

    args = main_parser.parse_args()
    if args.cmd is None:
        main_parser.print_help()
        return 1
    if not args.files:
        args.files = ["heracles.cfg"]
    kwargs = vars(args)
    cmd = kwargs.pop("cmd")

    logger = logging.getLogger(__name__)
    logger.addHandler(logging.StreamHandler())
    logger.setLevel(logging.DEBUG)
    try:
        cmd(**kwargs, logger=logger)
    except Exception as exc:  # noqa: BLE001
        logger.debug("Exception", exc_info=exc)
        logger.error(f"ERROR: {exc!s}")
        return 1
    return 0
