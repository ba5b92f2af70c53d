from .textfns import (
    normalize_text,
    shingles,
    token_count,
    tokens,
)

__all__ = ["normalize_text", "shingles", "token_count", "tokens"]
