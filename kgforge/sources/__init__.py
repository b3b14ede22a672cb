from kgforge.sources.html import extract_text_udf, html_to_text  # noqa: F401
