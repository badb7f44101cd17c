def decide_download(url: str) -> bool:
    """Stub (peptides_functional.py:12,64): with the processed cache
    pre-seeded, download() never runs.  Refuse loudly if it does."""
    raise RuntimeError(
        "decide_download stub reached: no network egress. The parity "
        "driver must pre-seed the processed dataset cache.")
