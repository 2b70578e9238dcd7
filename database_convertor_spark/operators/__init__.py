from . import (  # noqa: F401
    dedup,
    entity_resolution,
    graph,
    multimodal,
    relational,
    similarity_search,
    text_analysis,
)
