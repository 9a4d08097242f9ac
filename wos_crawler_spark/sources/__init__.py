from wos_crawler_spark.sources.exports import (  # noqa: F401
    read_bibtex_dir,
    read_export_dir,
    read_pages,
    read_seeds,
    write_normalized,
    write_pages,
)
