from wos_crawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize_url,
    canonicalize_url_py,
    url_host,
    with_url_canon,
)
