from . import correlation, geometry, matchers, pipeline  # noqa: F401
