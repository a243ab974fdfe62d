"""Pure-NumPy exact-semantics kernels (no Spark imports).

These reproduce, bit-for-bit, the three semantics the engine's
correctness hangs on (SURVEY.md §7):

- ``pip``       ray-casting point-in-ring  (reference ogr/ogrlinearring.cpp:452-521)
- ``burn``      scanline polygon fill + Bresenham line burn
                (reference alg/llrasterize.cpp:58-227, 255-384)
- ``ccl``       two-pass connected-component labeling for polygonize
                (reference alg/polygonize.cpp:73-300)
- ``checksum``  golden image checksum (reference alg/gdalchecksum.cpp:48-120)
- ``cells``     hierarchical spatial cell index (quadtree/Hilbert), the
                engine's join currency replacing the reference's
                quadtree/R-tree indexes (SURVEY.md §4)
- ``wkb``       minimal WKB geometry codec (point/linestring/polygon/multi*)
- ``geodesy``   geotransform + WebMercator tile math + Hilbert codes
"""
