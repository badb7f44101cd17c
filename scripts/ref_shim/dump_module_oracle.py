"""Execute a reference model module (graph_hscn.model.*) under the shim
and dump its weights + per-layer activations to an .npz, so the framework
test process can map the weights onto the flax models and assert per-layer
allclose against the EXECUTED reference modules (BASELINE.md north star;
round-4 verdict item 3).

Run with scripts/ref_shim and /root/reference on PYTHONPATH (the shim's
sitecustomize remaps pydantic to v1 for the reference's config imports —
which is why this runs as a subprocess of the test, never in-process).

Modes:
  mpnn  --conv gcn|gat : build_mpnn forward on a Batch of the input
        graphs; dumps each conv_layers[i] output (pre-activation) as
        act_{i}, the readout as out, and the state_dict as w::<name>.
  scn   : SCN forward on graph 0 with gcn_norm-ed edges (replicating
        train_clustering.py:37-47 one application); dumps the mp-stack
        output, softmax assignments s, mc/o losses, and the dense
        adjacency its dense_mincut_pool actually saw (post-gcn_norm
        edge_index, i.e. A+I — quirk #7 territory).
  hscn  : generate_hetero_data (executed, quirks #8/#9 live) on given
        per-node clusters -> Batch -> build_hscn forward; dumps each
        HeteroConv layer's pre-relu local/virtual outputs, the initial
        virtual features, and the head output.

Reference sites executed: model/mpnn.py:13-76, model/hscn.py:19-140,
loader/hetero_data.py:14-88.
"""

from __future__ import annotations

import argparse

import numpy as np
import torch


def load_graphs(z):
    from torch_geometric.data import Data
    nptr, eptr = z["node_ptr"], z["edge_ptr"]
    graphs = []
    for i in range(len(nptr) - 1):
        n0, n1 = int(nptr[i]), int(nptr[i + 1])
        e0, e1 = int(eptr[i]), int(eptr[i + 1])
        graphs.append(Data(
            x=torch.from_numpy(z["node_feat"][n0:n1]).float(),
            edge_index=torch.from_numpy(
                z["edge_index"][:, e0:e1]).long()))
    return graphs


def dump_state(model, out: dict) -> None:
    for name, t in model.state_dict().items():
        out[f"w::{name}"] = t.detach().numpy()


def run_mpnn(args, z, out):
    from torch_geometric.data.batch import Batch

    from graph_hscn.config.config import MPNNConfig
    from graph_hscn.model.mpnn import build_mpnn
    graphs = load_graphs(z)
    F = graphs[0].x.shape[1]
    # dropout 0.2 in the schema (its validator maps 0.0 to None —
    # config.py:58-63 falls through) but inert: model.eval() below.
    cfg = MPNNConfig.parse_obj(dict(
        conv_type=args.conv, activation="relu",
        hidden_channels=args.hidden, num_layers=args.layers,
        dropout=0.2, use_batch_norm=False, use_layer_norm=False))
    torch.manual_seed(args.seed)
    model = build_mpnn(cfg, F, args.classes)
    model.eval()
    acts = []
    for conv in model.conv_layers:
        conv.register_forward_hook(
            lambda m, i, o, acts=acts: acts.append(o.detach().numpy()))
    batch = Batch.from_data_list(graphs)
    with torch.no_grad():
        pred = model(batch)
    for i, a in enumerate(acts):
        out[f"act_{i}"] = a
    out["out"] = pred.detach().numpy()
    dump_state(model, out)


def run_scn(args, z, out):
    from torch_geometric.nn.conv import gcn_norm
    from torch_geometric.utils import to_dense_adj

    from graph_hscn.model.hscn import SCN
    graphs = load_graphs(z)
    g = graphs[0]
    torch.manual_seed(args.seed)
    scn = SCN([args.hidden], "relu", g.x.shape[1], args.clusters)
    scn.eval()
    captured = {}
    scn.mp.register_forward_hook(
        lambda m, i, o: captured.__setitem__("mp", o.detach().numpy()))
    # One gcn_norm application (train_clustering.py:37-42 first epoch).
    ei, ew = gcn_norm(g.edge_index, None, g.num_nodes, add_self_loops=True)
    with torch.no_grad():
        s, mc, o_loss, adj = scn(g.x.float(), ei, ew)
    out["mp_out"] = captured["mp"]
    out["s"] = s.detach().numpy()
    out["mc_loss"] = np.float32(mc.item())
    out["o_loss"] = np.float32(o_loss.item())
    # The adjacency the module's dense_mincut_pool actually consumed
    # (to_dense_adj over the post-gcn_norm edge_index: A + I).
    out["adj_used"] = adj.detach().numpy()
    assert np.allclose(out["adj_used"],
                       to_dense_adj(ei).detach().numpy())
    dump_state(scn, out)


def run_hscn(args, z, out):
    from torch_geometric.data.batch import Batch

    from graph_hscn.config.config import DataConfig, HSCNConfig
    from graph_hscn.loader.hetero_data import generate_hetero_data
    from graph_hscn.logger import CustomLogger
    from graph_hscn.model.hscn import build_hscn
    graphs = load_graphs(z)
    F = graphs[0].x.shape[1]
    nptr = z["node_ptr"]
    cluster_lst = [
        z["cluster"][int(nptr[i]):int(nptr[i + 1])].astype(np.int64)
        for i in range(len(graphs))]
    data_cfg = DataConfig.parse_obj(dict(
        dataset_name="peptides_func", pe=False, batch_size=len(graphs),
        num_workers=0))
    model_cfg = HSCNConfig.parse_obj(dict(
        activation="relu", lv_conv_type="GAT", ll_conv_type="GCN",
        vv_conv_type="GCN", hidden_channels=args.hidden,
        num_layers=args.layers, num_clusters=args.clusters,
        cluster_epochs=1))
    split_idx = {"train": torch.arange(len(graphs)),
                 "val": torch.arange(0), "test": torch.arange(0)}
    logger = CustomLogger(args.log, metric_name="ap")
    h_list = generate_hetero_data(cluster_lst, graphs, split_idx,
                                  data_cfg, model_cfg, logger)
    hbatch = Batch.from_data_list(h_list)
    torch.manual_seed(args.seed)
    model = build_hscn(model_cfg, F, args.classes)
    model.eval()
    layer_acts = []
    for conv in model.convs:
        conv.register_forward_hook(
            lambda m, i, o, acc=layer_acts: acc.append(
                {k: v.detach().numpy() for k, v in o.items()}))
    with torch.no_grad():
        pred = model(hbatch.x_dict, hbatch.edge_index_dict, hbatch)
    out["x_virtual_init"] = hbatch["virtual"].x.detach().numpy()
    vv = hbatch[("virtual", "to", "virtual")].edge_index
    out["vv_edge_index"] = vv.detach().numpy()
    for i, d in enumerate(layer_acts):
        out[f"local_{i}"] = d["local"]
        out[f"virtual_{i}"] = d["virtual"]
    out["out"] = pred.detach().numpy()
    # Quirk #17 probe (SURVEY.md): the reference's relation set
    # (hscn.py:83-94) has NO virtual->local edge type and the head pools
    # only x_dict["local"] (hscn.py:111), so the virtual-node pathway
    # cannot reach the output.  Prove it by execution: scramble the
    # virtual features and rerun the SAME model — the prediction must be
    # bit-identical.
    torch.manual_seed(args.seed + 1234)
    hbatch["virtual"].x = torch.randn_like(hbatch["virtual"].x) * 10.0
    with torch.no_grad():
        pred2 = model(hbatch.x_dict, hbatch.edge_index_dict, hbatch)
    out["out_virtual_scrambled"] = pred2.detach().numpy()
    dump_state(model, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["mpnn", "scn", "hscn"])
    ap.add_argument("--conv", default="gcn")
    ap.add_argument("--inputs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--clusters", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log", default="/tmp/dump_module_oracle.log")
    args = ap.parse_args()
    z = np.load(args.inputs)
    out: dict = {}
    {"mpnn": run_mpnn, "scn": run_scn, "hscn": run_hscn}[args.mode](
        args, z, out)
    np.savez(args.out, **out)
    print(f"dumped {len(out)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
