from .flagship import flagship_inverted_index

__all__ = ["flagship_inverted_index"]
