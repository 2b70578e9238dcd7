from . import (  # noqa: F401
    dedup,
    entity_resolution,
    graph,
    multimodal,
    relational,
    search,
    similarity_search,
    text_analysis,
)
