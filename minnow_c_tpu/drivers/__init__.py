"""L5 client drivers: standardized snapshot-format converters
(header_format.tex:37-42)."""

from . import gadget2  # noqa: F401

try:  # Illustris driver needs h5py; gate cleanly when absent
    from . import illustris  # noqa: F401
except ImportError:  # pragma: no cover
    illustris = None
