"""OGB stand-in for the reference subprocess.

The reference imports four OGB symbols
(/root/reference/graph_hscn/loader/dataset/peptides_functional.py:10-12,
loader/loader.py:6).  Only ``replace_numpy_with_torchtensor`` ever executes
in a parity run (inside ``get_idx_split``, peptides_functional.py:108-115):
the dataset's download/process phases are skipped because the parity driver
pre-seeds the processed cache with the shared synthetic graphs, so
``smiles2graph`` (RDKit) and the download helpers are import-satisfying
stubs that refuse loudly if ever reached.
"""
