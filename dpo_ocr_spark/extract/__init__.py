from .stage import extract_pages  # noqa: F401
from .html import extract_html  # noqa: F401
from .layout import extract_layout  # noqa: F401
