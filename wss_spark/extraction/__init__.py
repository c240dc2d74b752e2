from wss_spark.extraction.parse_page import (  # noqa: F401
    extract_comments,
    extract_entities,
    extract_reposts,
    extract_text,
    extract_weibo,
)
