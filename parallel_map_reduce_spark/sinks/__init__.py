from .text_sink import write_letter_files

__all__ = ["write_letter_files"]
