"""Laplacian positional-encoding statistics (reference transform/posenc.py).

Per graph: symmetric-normalized graph Laplacian -> dense eigendecomposition
-> keep the ``max_freqs`` smallest eigenpairs -> normalize eigenvectors
(L1/L2/abs-max, posenc.py:85-107) -> NaN-pad when N < max_freqs
(posenc.py:67-78).

Two implementations:
- host (numpy/LAPACK) per graph — one-time preprocessing, cached on the
  GraphData (mirrors the reference's pre_transform_in_memory flow,
  loader.py:80-86);
- batched device path (``batched_eigh``) — dense per-graph blocks +
  vmapped ``jnp.linalg.eigh`` for on-TPU PE computation.

``attach_posenc`` then applies SignNet.  With ``frozen_random=True`` it
reproduces the reference's quirk #6 (train.py:29-51): a randomly
initialized, frozen SignNet encoder is mapped once over the dataset and its
output concatenated into the node features.
"""

from __future__ import annotations

import numpy as np

from graph_hscn_tpu.data.batching import GraphData


def _sym_laplacian(g: GraphData, norm: str | None = "sym") -> np.ndarray:
    n = g.num_nodes
    a = np.zeros((n, n), dtype=np.float64)
    src, dst = g.edge_index
    np.add.at(a, (dst, src), 1.0)
    deg = a.sum(axis=1)
    if norm is None:
        return np.diag(deg) - a
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(deg)
    dinv[~np.isfinite(dinv)] = 0.0
    return np.eye(n) - dinv[:, None] * a * dinv[None, :]


def eigvec_normalizer(evects: np.ndarray, normalization: str = "L2",
                      eps: float = 1e-12) -> np.ndarray:
    """Column-wise normalization (reference posenc.py:85-107)."""
    if normalization == "L1":
        denom = np.abs(evects).sum(axis=0, keepdims=True)
    elif normalization == "L2":
        denom = np.linalg.norm(evects, axis=0, keepdims=True)
    elif normalization == "abs-max":
        denom = np.abs(evects).max(axis=0, keepdims=True)
    else:
        raise ValueError(f"Unsupported normalization `{normalization}`")
    return evects / np.maximum(denom, eps)


def compute_posenc_stats(g: GraphData, max_freqs: int = 10,
                         eigvec_norm: str = "L2",
                         laplacian_norm: str = "sym",
                         dense_threshold: int = 2048) -> GraphData:
    """Attach eigvals [N, K] / eigvecs [N, K] to one graph (NaN-padded when
    N < K, like reference posenc.py:67-78).

    Graphs above ``dense_threshold`` nodes route to the matrix-free LOBPCG
    path (:func:`sparse_lap_stats`) — the reference's dense
    ``np.linalg.eigh`` (posenc.py:40) is O(N^2) memory / O(N^3) compute
    and simply cannot produce PE for giant graphs.
    """
    n = g.num_nodes
    if n > dense_threshold and n >= 8 * max_freqs:
        return sparse_lap_stats(g, max_freqs=max_freqs,
                                eigvec_norm=eigvec_norm,
                                laplacian_norm=laplacian_norm)
    norm = None if laplacian_norm.lower() == "none" else laplacian_norm
    lap = _sym_laplacian(g, norm)
    evals, evects = np.linalg.eigh(lap)
    idx = np.argsort(evals)[:max_freqs]
    evals = np.clip(np.real(evals[idx]), 0.0, None)
    evects = np.real(evects[:, idx]).astype(np.float32)
    evects = eigvec_normalizer(evects, eigvec_norm)

    k = len(idx)
    eigvecs = np.full((n, max_freqs), np.nan, dtype=np.float32)
    eigvecs[:, :k] = evects
    eigvals = np.full((max_freqs,), np.nan, dtype=np.float32)
    eigvals[:k] = evals
    eigvals = np.broadcast_to(eigvals, (n, max_freqs)).copy()
    return g.replace(eigvals=eigvals, eigvecs=eigvecs)


def sparse_lap_stats(g: GraphData, max_freqs: int = 10,
                     eigvec_norm: str = "L2",
                     laplacian_norm: str = "sym",
                     iters: int = 200) -> GraphData:
    """Sparse-Laplacian PE for large graphs — no N×N matrix ever exists.

    Primary path: ARPACK shift-invert (``scipy.sparse.linalg.eigsh`` with
    ``sigma=0``) on the CSR Laplacian — the smallest eigenpairs of graph
    Laplacians are tightly clustered, which shift-invert resolves to
    machine precision in a handful of Lanczos iterations (host-side
    preprocessing, same stage as the reference's LAPACK call,
    posenc.py:40).  Fallback when ARPACK fails to converge: on-device
    LOBPCG (``jax.experimental.sparse.linalg.lobpcg_standard``) on the
    PSD operator ``c·I − L`` whose matvec is one gather + segment-sum.
    Eigenvalue order and normalization match the dense path; within
    degenerate eigenspaces any orthobasis is valid (same as LAPACK's
    arbitrary choice).
    """
    import scipy.sparse as sp

    n = g.num_nodes
    k = min(max_freqs, n)
    src, dst = (np.asarray(a, np.int64) for a in g.edge_index)
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    norm = laplacian_norm.lower() != "none"
    if norm:
        with np.errstate(divide="ignore"):
            dinv = 1.0 / np.sqrt(deg)
        dinv[~np.isfinite(dinv)] = 0.0
        w = dinv[src] * dinv[dst]
        diag = np.ones(n)                        # L = I - Anorm
        c = 2.0
    else:
        w = np.ones(len(src))
        diag = deg                               # L = D - A
        c = float(2.0 * max(deg.max(), 1.0))
    lap = (sp.csr_matrix((diag, (np.arange(n), np.arange(n))),
                         shape=(n, n))
           - sp.csr_matrix((w, (dst, src)), shape=(n, n)))

    try:
        from scipy.sparse.linalg import eigsh
        # Small NEGATIVE shift: L is PSD with lambda_0 = 0, so L - sigma*I
        # is positive definite and the shift-invert factorization is
        # well-posed (sigma=0 would LU-factor a singular matrix).
        evals, u = eigsh(lap.tocsc(), k=k, sigma=-1e-2, which="LM")
    except Exception:                            # ARPACK non-convergence
        evals, u = _lobpcg_smallest(lap, n, k, c, iters)
    evals = np.clip(np.real(evals), 0.0, None)
    order = np.argsort(evals)[:k]
    evals = evals[order]
    evects = eigvec_normalizer(np.asarray(u, np.float32)[:, order],
                               eigvec_norm)

    eigvecs = np.full((n, max_freqs), np.nan, dtype=np.float32)
    eigvecs[:, :k] = evects
    eigvals_row = np.full((max_freqs,), np.nan, dtype=np.float32)
    eigvals_row[:k] = evals
    eigvals = np.broadcast_to(eigvals_row, (n, max_freqs)).copy()
    return g.replace(eigvals=eigvals, eigvecs=eigvecs)


def _lobpcg_smallest(lap, n: int, k: int, c: float, iters: int):
    """On-device LOBPCG fallback: top-k of the PSD operator c·I − L via a
    gather + segment-sum matvec (MXU block matmuls on the [N, k] search
    space)."""
    import jax
    import jax.numpy as jnp

    coo = lap.tocoo()
    src_j = jnp.asarray(coo.col, jnp.int32)
    dst_j = jnp.asarray(coo.row, jnp.int32)
    w_j = jnp.asarray(coo.data, jnp.float32)
    # c I - L applied as (c x - L x); L x via the COO triplets directly.
    def B(x):
        lx = jax.ops.segment_sum(x[src_j] * w_j[:, None], dst_j, n)
        return c * x - lx

    from jax.experimental.sparse.linalg import lobpcg_standard
    x0 = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.float32)
    theta, u, _ = lobpcg_standard(B, x0, m=iters)
    return c - np.asarray(theta, np.float64), np.asarray(u)


def batched_eigh(adj_dense, node_mask):
    """Device path: eigendecomposition of sym-normalized Laplacians of dense
    per-graph blocks [G, n_max, n_max].  Padding rows/cols are forced to an
    identity sub-block so their spurious eigenpairs have eigenvalue 1 and
    zero support on real nodes; callers mask by n_node when slicing the k
    smallest.  Returns (evals [G, n_max], evects [G, n_max, n_max])."""
    import jax.numpy as jnp

    m = node_mask.astype(adj_dense.dtype)
    a = adj_dense * m[:, :, None] * m[:, None, :]
    deg = jnp.sum(a, axis=-1)
    dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
    n = adj_dense.shape[-1]
    eye = jnp.eye(n, dtype=adj_dense.dtype)
    lap = eye - a * dinv[:, :, None] * dinv[:, None, :]
    # Padding diagonal entries stay 1 (isolated nodes): eigenvalue 1.
    evals, evects = jnp.linalg.eigh(lap)
    return evals, evects


def attach_posenc(dm, pe_cfg, logger, frozen_random: bool = True,
                  seed: int = 0) -> None:
    """Compute eigen stats for every graph, then apply SignNet.

    frozen_random=True (reference quirk #6): random-init SignNet runs once
    under no-grad as a dataset transform; node features become
    [Linear(x) | PE] with dim_emb total width.
    frozen_random=False: eigen fields stay on the batch for end-to-end
    SignNet training inside the model (the sane fix of quirk #6).
    """
    logger.info("Precomputing Laplacian eigen stats for all graphs...")
    dm.apply_transform(lambda g: compute_posenc_stats(
        g, max_freqs=pe_cfg.eigen_max_freqs,
        eigvec_norm=pe_cfg.eigvec_norm,
        laplacian_norm=pe_cfg.eigen_laplacian_norm))

    if not frozen_random:
        logger.info("PE stats attached; SignNet trains end-to-end.")
        return

    import jax
    import numpy as np  # noqa: F811

    from graph_hscn_tpu.data.batching import iter_batches
    from graph_hscn_tpu.models.signnet import SignNetNodeEncoder

    enc = SignNetNodeEncoder(
        dim_in=dm.num_features, dim_emb=pe_cfg.dim_emb,
        dim_pe=pe_cfg.dim_pe, phi_hidden_dim=pe_cfg.phi_hidden_dim,
        phi_out_dim=pe_cfg.phi_out_dim, sign_inv_layers=pe_cfg.layers,
        rho_layers=pe_cfg.post_layers, max_freqs=pe_cfg.eigen_max_freqs,
        model_type=pe_cfg.model,
        # Frozen-random (quirk #6): the untrained weights ARE the model,
        # so the init family must match the reference's torch defaults
        # for the PE feature distribution to be comparable.
        torch_init=True)
    example = dm.example_batch()
    params = enc.init(jax.random.PRNGKey(seed), example)["params"]
    apply = jax.jit(lambda b: enc.apply({"params": params}, b))

    logger.info("Applying frozen random SignNet transform "
                "(reference train.py:29-51 semantics)...")
    new_graphs = []
    for batch in iter_batches(dm.graphs, dm.batch_size, dm.budget,
                              shuffle=False):
        new_x = np.asarray(apply(batch))
        ng = np.asarray(batch.node_graph)
        nm = np.asarray(batch.node_mask)
        base = len(new_graphs)
        for gi in range(int(batch.graph_mask.sum())):
            g = dm.graphs[base + gi]
            new_graphs.append(g.replace(x=new_x[nm & (ng == gi)]))
    assert len(new_graphs) == len(dm.graphs)
    dm.graphs = new_graphs
    dm.num_features = pe_cfg.dim_emb
    logger.info(f"PE transform done; node feature dim -> {pe_cfg.dim_emb}")
