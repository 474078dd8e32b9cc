import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.models.gat import (
    DenseGAT,
    GATNetwork,
    LatticeGAT,
    adjacency_from_edge_index,
    fully_connected_adjacency,
)
from mingraph_unet_tpu.models.mincut import (
    MinCutRefinement,
    normalized_cut_loss_dense,
    normalized_cut_loss_lattice,
)
from mingraph_unet_tpu.ops import lattice as lattice_ops

from conftest import requires_reference

# The 10-node fixture graph from graph_attention.py:209-210.
FIXTURE_EDGES = np.array(
    [
        [0, 1, 1, 2, 2, 3, 3, 0, 4, 5, 5, 6, 7, 8, 8, 9, 9, 4],
        [1, 0, 2, 1, 3, 2, 0, 3, 5, 4, 6, 5, 8, 7, 9, 8, 4, 9],
    ]
)


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.fixture(autouse=True)
def _highest_precision():
    # fp32 parity/equivalence checks need exact matmuls (the CPU backend's
    # default fast path downcasts accumulation).
    with jax.default_matmul_precision("highest"):
        yield


class TestDenseGAT:
    def test_output_shapes(self):
        x = jnp.asarray(rng().random((10, 16)), jnp.float32)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, 10)
        for concat, heads, out in [(True, 4, 32), (False, 4, 16), (True, 1, 8)]:
            layer = DenseGAT(out_features=out, num_heads=heads, concat=concat)
            v = layer.init(jax.random.key(0), x, adj)
            y = layer.apply(v, x, adj)
            assert y.shape == (10, out)

    def test_concat_divisibility_enforced(self):
        x = jnp.zeros((4, 8))
        adj = fully_connected_adjacency(4)
        layer = DenseGAT(out_features=10, num_heads=4, concat=True)
        with pytest.raises(ValueError):
            layer.init(jax.random.key(0), x, adj)

    def test_isolated_node_outputs_zero(self):
        # Node with no incoming edges → aggregation 0 → ELU(0) = 0
        # (reference scatter_add leaves zeros, graph_attention.py:107-118).
        x = jnp.asarray(rng(1).random((3, 4)), jnp.float32)
        adj = jnp.zeros((3, 3)).at[1, 0].set(1.0)  # only edge 0→1
        layer = DenseGAT(out_features=4, num_heads=1, concat=False)
        v = layer.init(jax.random.key(0), x, adj)
        y = layer.apply(v, x, adj)
        np.testing.assert_allclose(np.asarray(y[0]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(y[2]), 0.0, atol=1e-7)
        assert np.abs(np.asarray(y[1])).max() > 0

    def test_batched(self):
        x = jnp.asarray(rng(2).random((5, 10, 16)), jnp.float32)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, 10)
        layer = DenseGAT(out_features=8, num_heads=2, concat=True)
        v = layer.init(jax.random.key(0), x, adj)
        y = layer.apply(v, x, adj)
        assert y.shape == (5, 10, 8)
        # Per-sample equals unbatched apply.
        y0 = layer.apply(v, x[0], adj)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), atol=2e-6)


class TestLatticeGAT:
    def test_matches_dense_on_lattice(self):
        nph, npw, d = 3, 4, 6
        x_grid = jnp.asarray(rng(3).random((nph, npw, d)), jnp.float32)
        x_flat = x_grid.reshape(nph * npw, d)
        adj = adjacency_from_edge_index(lattice_ops.lattice_edge_index(nph, npw), nph * npw)

        lat = LatticeGAT(out_features=8, num_heads=2, concat=True)
        v = lat.init(jax.random.key(7), x_grid)
        y_lat = lat.apply(v, x_grid)

        dense = DenseGAT(out_features=8, num_heads=2, concat=True)
        vd = dense.init(jax.random.key(0), x_flat, adj)
        # Same parameters for both formulations.
        vd = {"params": {"heads": v["params"]["heads"]}}
        y_dense = dense.apply(vd, x_flat, adj)
        np.testing.assert_allclose(
            np.asarray(y_lat).reshape(nph * npw, -1), np.asarray(y_dense), atol=1e-5
        )

    def test_batched_grid(self):
        x = jnp.asarray(rng(4).random((2, 4, 4, 5)), jnp.float32)
        lat = LatticeGAT(out_features=6, num_heads=3, concat=False)
        v = lat.init(jax.random.key(0), x)
        y = lat.apply(v, x)
        assert y.shape == (2, 4, 4, 6)


class TestGATNetwork:
    def test_single_layer_averages_to_output_dim(self):
        x = jnp.asarray(rng(5).random((10, 32)), jnp.float32)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, 10)
        net = GATNetwork(hidden_dim=64, output_dim=16, num_heads=4, num_layers=1)
        v = net.init(jax.random.key(0), x, adj)
        assert net.apply(v, x, adj).shape == (10, 16)

    def test_two_layers(self):
        x = jnp.asarray(rng(6).random((10, 32)), jnp.float32)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, 10)
        net = GATNetwork(hidden_dim=32, output_dim=16, num_heads=4, num_layers=2)
        v = net.init(jax.random.key(0), x, adj)
        assert net.apply(v, x, adj).shape == (10, 16)

    def test_lattice_backend(self):
        x = jnp.asarray(rng(7).random((2, 3, 3, 8)), jnp.float32)
        net = GATNetwork(hidden_dim=16, output_dim=4, num_heads=2, num_layers=1, backend="lattice")
        v = net.init(jax.random.key(0), x)
        assert net.apply(v, x).shape == (2, 3, 3, 4)


@requires_reference
class TestTorchParity:
    def _torch_single_head(self, reference_path, x_np, edges, in_dim, out_dim):
        import torch
        from model.gat.graph_attention import GraphAttentionLayer

        t = GraphAttentionLayer(in_dim, out_dim, dropout_rate=0.0, alpha=0.2)
        t.eval()
        return t

    def test_single_head_parity(self, reference_path):
        import torch

        from torch_bridge import copy_gat_head

        in_dim, out_dim, n = 16, 8, 10
        x_np = rng(8).standard_normal((n, in_dim)).astype(np.float32)
        layer = DenseGAT(out_features=out_dim, num_heads=1, concat=False, alpha=0.2)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, n)
        v = layer.init(jax.random.key(0), jnp.asarray(x_np), adj)

        t = self._torch_single_head(reference_path, x_np, FIXTURE_EDGES, in_dim, out_dim)
        hp = v["params"]["heads"]
        copy_gat_head(t, np.asarray(hp["W"])[0], np.asarray(hp["a_src"])[0], np.asarray(hp["a_dst"])[0])
        with torch.no_grad():
            ref = t(torch.from_numpy(x_np), torch.from_numpy(FIXTURE_EDGES)).numpy()

        ours = np.asarray(layer.apply(v, jnp.asarray(x_np), adj))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    def test_multihead_concat_parity(self, reference_path):
        import torch
        from model.gat.graph_attention import MultiHeadGATLayer

        from torch_bridge import copy_multihead

        in_dim, out_dim, heads, n = 12, 8, 4, 10
        x_np = rng(9).standard_normal((n, in_dim)).astype(np.float32)
        layer = DenseGAT(out_features=out_dim, num_heads=heads, concat=True, alpha=0.2)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, n)
        v = layer.init(jax.random.key(1), jnp.asarray(x_np), adj)

        t = MultiHeadGATLayer(in_dim, out_dim, heads, dropout_rate=0.0, alpha=0.2, concat=True)
        t.eval()
        copy_multihead(t, v["params"]["heads"])
        with torch.no_grad():
            ref = t(torch.from_numpy(x_np), torch.from_numpy(FIXTURE_EDGES)).numpy()
        ours = np.asarray(layer.apply(v, jnp.asarray(x_np), adj))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    def test_multihead_average_parity(self, reference_path):
        import torch
        from model.gat.graph_attention import MultiHeadGATLayer

        from torch_bridge import copy_multihead

        in_dim, out_dim, heads, n = 12, 6, 3, 10
        x_np = rng(10).standard_normal((n, in_dim)).astype(np.float32)
        layer = DenseGAT(out_features=out_dim, num_heads=heads, concat=False, alpha=0.2)
        adj = adjacency_from_edge_index(FIXTURE_EDGES, n)
        v = layer.init(jax.random.key(2), jnp.asarray(x_np), adj)

        t = MultiHeadGATLayer(in_dim, out_dim, heads, dropout_rate=0.0, alpha=0.2, concat=False)
        t.eval()
        copy_multihead(t, v["params"]["heads"])
        with torch.no_grad():
            ref = t(torch.from_numpy(x_np), torch.from_numpy(FIXTURE_EDGES)).numpy()
        ours = np.asarray(layer.apply(v, jnp.asarray(x_np), adj))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


class TestNcutLoss:
    def test_lattice_matches_dense(self):
        nph, npw, d, k = 4, 5, 6, 3
        feats = jnp.asarray(rng(11).random((nph, npw, d)), jnp.float32)
        logits = rng(11).standard_normal((nph, npw, k)).astype(np.float32)
        soft = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        lat = normalized_cut_loss_lattice(feats, soft)
        adj = adjacency_from_edge_index(
            lattice_ops.lattice_edge_index(nph, npw), nph * npw
        )
        dense = normalized_cut_loss_dense(
            feats.reshape(-1, d), adj, soft.reshape(-1, k)
        )
        np.testing.assert_allclose(float(lat), float(dense), rtol=1e-5)

    def test_uniform_assignment_positive(self):
        feats = jnp.asarray(rng(12).random((4, 4, 3)), jnp.float32)
        soft = jnp.full((4, 4, 2), 0.5)
        loss = normalized_cut_loss_lattice(feats, soft)
        assert float(loss) > 0

    def test_perfect_partition_lower_loss(self):
        # Two feature-homogeneous halves: assigning by half must beat uniform.
        feats = np.zeros((4, 4, 2), np.float32)
        feats[:, 2:] = 5.0
        soft_good = np.zeros((4, 4, 2), np.float32)
        soft_good[:, :2, 0] = 1.0
        soft_good[:, 2:, 1] = 1.0
        good = normalized_cut_loss_lattice(jnp.asarray(feats), jnp.asarray(soft_good))
        uniform = normalized_cut_loss_lattice(jnp.asarray(feats), jnp.full((4, 4, 2), 0.5))
        assert float(good) < float(uniform)

    @requires_reference
    def test_dense_matches_reference(self, reference_path):
        import torch
        from model.graph_partition.mincut_refinement import MinCutRefinement as TorchMinCut

        n, d, k = 20, 8, 3
        feats = rng(13).standard_normal((n, d)).astype(np.float32)
        soft_np = rng(13).random((n, k)).astype(np.float32)
        soft_np /= soft_np.sum(axis=1, keepdims=True)
        # Line graph fixture from mincut_refinement.py:216-222.
        src = np.arange(0, n - 1)
        tgt = np.arange(1, n)
        edges = np.stack([np.concatenate([src, tgt]), np.concatenate([tgt, src])])

        t = TorchMinCut()
        ref = t.normalized_cut_loss(
            torch.from_numpy(feats), torch.from_numpy(edges), torch.from_numpy(soft_np), k
        )
        adj = adjacency_from_edge_index(edges, n)
        ours = normalized_cut_loss_dense(jnp.asarray(feats), adj, jnp.asarray(soft_np))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestMinCutModule:
    def test_lattice_forward(self):
        x = jnp.asarray(rng(14).random((2, 4, 4, 8)), jnp.float32)
        m = MinCutRefinement(num_segments=3, backend="lattice", predictor_heads=1)
        v = m.init(jax.random.key(0), x)
        loss, soft = m.apply(v, x)
        assert loss.shape == (2,)
        assert soft.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)

    def test_dense_forward_mlp_predictor(self):
        x = jnp.asarray(rng(15).random((6, 8)), jnp.float32)
        adj = fully_connected_adjacency(6)
        m = MinCutRefinement(num_segments=2, backend="dense", predictor_use_gnn=False)
        v = m.init(jax.random.key(0), x, adj)
        loss, soft = m.apply(v, x, adj)
        assert loss.shape == ()
        assert soft.shape == (6, 2)
