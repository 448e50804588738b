from mapreducegcp_spark.sources.catalog import (  # noqa: F401
    TABLES,
    docs_from_dir,
    docs_from_file,
    docs_from_string,
    load_table,
)
