from . import cleaning, similarity, text  # noqa: F401
