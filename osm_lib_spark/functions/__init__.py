from osm_lib_spark.functions import geo, tags, tiles  # noqa: F401
