from .gdsii import GDSCell, GDSLibrary, GDSPolygon, read_gds, write_gds
from .layout import mask_from_gds, mask_from_polygons
from .native import native_available, rasterize
