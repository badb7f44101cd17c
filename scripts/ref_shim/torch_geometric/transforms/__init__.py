"""BaseTransform: typing-only in the reference
(peptides_functional.py:14,26-27)."""


class BaseTransform:
    def __call__(self, data):
        raise NotImplementedError
