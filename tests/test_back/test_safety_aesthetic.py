"""Safety model loading (torch H14 .pth layout, npz layout) and aesthetic
query steering."""

import numpy as np
import pytest

from clip_retrieval_tpu.models import safety as safety_mod


def test_torch_h14_state_dict_conversion(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from torch import nn

    # same Sequential topology as the reference h14_nsfw_model.py:17-34
    layers = nn.Sequential(
        nn.Linear(64, 1024), nn.ReLU(), nn.Dropout(0.2),
        nn.Linear(1024, 2048), nn.ReLU(), nn.Dropout(0.2),
        nn.Linear(2048, 1024), nn.ReLU(), nn.Dropout(0.2),
        nn.Linear(1024, 256), nn.ReLU(), nn.Dropout(0.2),
        nn.Linear(256, 128), nn.ReLU(), nn.Dropout(0.2),
        nn.Linear(128, 16), nn.Linear(16, 1),
    )

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = layers

    model = Wrap().eval()
    path = tmp_path / "model.pt"
    torch.save(model.state_dict(), path)

    weights = safety_mod._torch_mlp_to_weights(
        torch.load(path, weights_only=False)
    )
    mlp = safety_mod.JaxMLP(weights)
    x = np.random.default_rng(0).normal(size=(5, 64)).astype(np.float32)
    ours = mlp.predict(x, batch_size=5)
    with torch.no_grad():
        ref = model.layers(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_npz_mlp_roundtrip(tmp_path):
    mlp = safety_mod.JaxMLP.random(32)
    path = str(tmp_path / "nsfw_mlp.npz")
    safety_mod.save_mlp_npz(
        path, [(np.asarray(w), np.asarray(b)) for w, b in mlp.weights]
    )
    with np.load(path) as z:
        n = len([k for k in z.files if k.startswith("w")])
        weights = [(z[f"w{i}"], z[f"b{i}"]) for i in range(n)]
    mlp2 = safety_mod.JaxMLP(weights)
    x = np.random.default_rng(1).normal(size=(3, 32)).astype(np.float32)
    np.testing.assert_allclose(
        mlp.predict(x, 3), mlp2.predict(x, 3), atol=1e-6
    )


def test_aesthetic_steering_changes_query():
    from clip_retrieval_tpu.back.knn import KnnService

    class FakeResource:
        aesthetic_embeddings = {
            9: np.ones((1, 8), np.float32) * 0.5,
        }

    svc = KnnService({})
    q = np.zeros((1, 8), np.float32)
    q[0, 0] = 1.0
    steered = svc.compute_query.__wrapped__ if hasattr(
        svc.compute_query, "__wrapped__"
    ) else None
    # drive through compute_query's embedding_input path
    out = svc.compute_query(
        FakeResource(),
        "any",
        text_input=None,
        image_input=None,
        image_url_input=None,
        embedding_input=q[0].tolist(),
        use_mclip=False,
        aesthetic_score=9,
        aesthetic_weight=0.5,
    )
    assert out.shape == (1, 8)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)
    # steering moved the query away from the raw embedding
    assert not np.allclose(out, q / np.linalg.norm(q))
    # weight=None → no steering
    out2 = svc.compute_query(
        FakeResource(), "any", None, None, None, q[0].tolist(), False, None, None
    )
    np.testing.assert_allclose(out2[0], q[0] / np.linalg.norm(q[0]), atol=1e-6)
