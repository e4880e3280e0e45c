"""Statistical end-to-end validation: the trained latent space must recover
the synthetic spatial domains (ARI), the framework's analogue of the
reference's golden-output regression (SURVEY.md §4 — RNG parity across
frameworks is impossible, so parity is defined statistically, per
BASELINE.json)."""
import numpy as np
import pytest
from sklearn.cluster import KMeans
from sklearn.metrics import adjusted_rand_score

from _synthetic import make_synthetic_adata
from spadot_tpu.config import default_config
from spadot_tpu.data.pipeline import prepare_data
from spadot_tpu.utils.rng import set_seed


@pytest.mark.slow
def test_latent_recovers_domains():
    from spadot_tpu.train.loop import get_latent, train_spadot

    adata = make_synthetic_adata(
        n_per_tp=200, n_genes=40, n_tp=2, n_domains=3, seed=7
    )
    cfg = default_config()
    cfg.update(
        input_dim=40, timepoints=[0, 1], maxiter=25, ot_epoch=10,
        batch_size=128, inducing_point_nums=60, gat_encoder_hidden=32,
        gat_attention_heads=2, svgp_encoder_layers=[64, 32],
        decoder_layers=[32, 64], n_clusters=3,
    )
    cfg["ot_config"]["ot_epochs"] = 5
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, _, host_state, loss_df = train_spadot(data, cfg)
    lat = get_latent(trainer, variables, data, adata)

    # domain recovery per timepoint
    for tp in (0, 1):
        rows = (lat.obs["timepoint"] == tp).to_numpy()
        pred = KMeans(n_clusters=3, random_state=1993, n_init=10).fit(
            lat.toarray()[rows]
        ).labels_
        truth = lat.obs["true_domain"].to_numpy()[rows]
        ari = adjusted_rand_score(truth, pred)
        assert ari > 0.6, f"tp {tp}: ARI {ari:.3f} too low"

    # the training objective should actually improve
    assert loss_df["Recon"].iloc[-1] < loss_df["Recon"].iloc[0]
