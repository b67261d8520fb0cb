from .vector import cosine_similarity, dot_product, l2_distance, l2_norm  # noqa: F401
from .text import (  # noqa: F401
    TOKEN_PATTERN,
    token_count,
    whitespace_words,
    word_count,
)
