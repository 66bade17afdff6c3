from .emit import analyze_bubbles  # noqa: F401
