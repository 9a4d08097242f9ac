from wos_crawler_spark.sources.exports import (  # noqa: F401
    read_bibtex_dir,
    read_export_dir,
    read_pages,
    read_seeds,
    read_tab_dir,
    write_normalized,
    write_pages,
)
from wos_crawler_spark.sources.iceberg import (  # noqa: F401
    iceberg_available,
    merge_into_sql,
    write_normalized_auto,
)
