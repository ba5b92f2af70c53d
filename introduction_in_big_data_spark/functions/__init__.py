from .textfns import (
    normalize_text,
    shingles_from_tokens,
    token_count,
    tokens,
)

__all__ = ["normalize_text", "shingles_from_tokens", "token_count", "tokens"]
