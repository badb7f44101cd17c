def smiles2graph(smiles_string: str) -> dict:
    """Import-satisfying stub (peptides_functional.py:10,25).  Never executes
    in a parity run: the driver pre-seeds the processed dataset cache, so
    InMemoryDataset skips download()/process() entirely."""
    raise RuntimeError(
        "smiles2graph stub reached: RDKit is unavailable in this image. "
        "The parity driver must pre-seed the processed dataset cache so "
        "the reference's process() phase never runs.")
