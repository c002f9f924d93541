from .base import Q

QUERIES: dict[str, Q] = {}
