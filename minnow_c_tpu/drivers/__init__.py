"""L5 client drivers: standardized snapshot-format converters
(header_format.tex:37-42)."""

from . import gadget2  # noqa: F401
