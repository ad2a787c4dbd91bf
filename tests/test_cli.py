"""CLI workflow tests: fit -> artifacts -> sample -> check-myopic."""

import numpy as np
import pytest

from vgan_tpu.cli import main


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = d / "x.npy"
    np.save(path, np.random.default_rng(0).normal(size=(96, 16)))
    return path


def test_fit_sample_myopic_roundtrip(data_file, tmp_path, capsys):
    out = tmp_path / "run"
    rc = main([
        "fit", "--data", str(data_file), "--variant", "no_kl",
        "--epochs", "2", "--batch-size", "32", "--quiet",
        "--out", str(out), "--checkpoint", str(tmp_path / "ck"),
    ])
    assert rc == 0
    gen = out / "models" / "generator_0.msgpack"
    assert gen.is_file()
    assert (out / "params.csv").is_file()
    assert (out / "metrics.jsonl").is_file()
    from vgan_tpu.utils.checkpoint import load_meta

    assert load_meta(tmp_path / "ck") is not None

    rc = main(["sample", "--generator", str(gen), "--ndims", "16",
               "--nsubs", "32", "--out", str(tmp_path / "u.npy")])
    assert rc == 0
    u = np.load(tmp_path / "u.npy")
    assert u.shape == (32, 16) and u.dtype == bool

    rc = main(["check-myopic", "--data", str(data_file),
               "--generator", str(gen), "--count", "64"])
    assert rc == 0
    assert "recommended bandwidth" in capsys.readouterr().out


def test_fit_kl_variant(data_file, tmp_path):
    rc = main([
        "fit", "--data", str(data_file), "--variant", "kl",
        "--epochs", "2", "--batch-size", "32", "--quiet",
    ])
    assert rc == 0


def test_fit_kl_gumbel_and_latent_flags(data_file, tmp_path):
    """--generator-grad / --latent-size reach the kl training config."""
    rc = main([
        "fit", "--data", str(data_file), "--variant", "kl",
        "--epochs", "2", "--batch-size", "32", "--quiet",
        "--generator-grad", "gumbel_st", "--latent-size", "4",
    ])
    assert rc == 0


def test_fit_csv_input(tmp_path):
    x = np.random.default_rng(1).normal(size=(64, 8))
    csv = tmp_path / "x.csv"
    np.savetxt(csv, x, delimiter=",")
    rc = main(["fit", "--data", str(csv), "--variant", "no_kl",
               "--epochs", "1", "--batch-size", "32", "--quiet"])
    assert rc == 0


def test_score_subcommand(data_file, tmp_path):
    out = tmp_path / "m"
    rc = main(["fit", "--data", str(data_file), "--variant", "no_kl",
               "--epochs", "1", "--batch-size", "32", "--quiet",
               "--out", str(out)])
    assert rc == 0
    gen = out / "models" / "generator_0.msgpack"

    scores_path = tmp_path / "scores.npy"
    rc = main(["score", "--train", str(data_file), "--generator", str(gen),
               "--base", "copod", "--subspaces", "64",
               "--out", str(scores_path)])
    assert rc == 0
    scores = np.load(scores_path)
    assert scores.shape == (96,)
    assert np.all(np.isfinite(scores))


def test_unknown_subcommand_fails():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_fit_with_mesh_flag(data_file, tmp_path):
    """--mesh data=4,model=2 runs the data-parallel fit on the CPU mesh."""
    out = tmp_path / "run_mesh"
    rc = main([
        "fit", "--data", str(data_file), "--variant", "kl",
        "--epochs", "2", "--batch-size", "8", "--quiet",
        "--mesh", "data=4,model=2", "--shard-features",
        "--out", str(out),
    ])
    assert rc == 0
    assert (out / "models" / "generator_0.msgpack").is_file()


def test_fit_mesh_flag_rejects_bad_spec(data_file):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["fit", "--data", str(data_file), "--epochs", "1",
              "--quiet", "--mesh", "rows=4"])


def test_score_iforest_with_mesh(data_file, tmp_path):
    out = tmp_path / "run_if"
    rc = main([
        "fit", "--data", str(data_file), "--variant", "no_kl",
        "--epochs", "2", "--batch-size", "32", "--quiet",
        "--out", str(out),
    ])
    assert rc == 0
    gen = out / "models" / "generator_0.msgpack"
    rc = main([
        "score", "--train", str(data_file), "--generator", str(gen),
        "--base", "iforest", "--n-trees", "32", "--subspaces", "16",
        "--mesh", "data=8", "--out", str(tmp_path / "s.npy"),
    ])
    assert rc == 0
    s = np.load(tmp_path / "s.npy")
    assert s.shape == (96,) and np.all(np.isfinite(s))


def test_score_hbos_aom(data_file, tmp_path):
    """CLI coverage for the round-2 additions: base=hbos + aggregation=aom."""
    out = tmp_path / "run_hb"
    rc = main([
        "fit", "--data", str(data_file), "--variant", "no_kl",
        "--epochs", "1", "--batch-size", "32", "--quiet",
        "--out", str(out),
    ])
    assert rc == 0
    gen = out / "models" / "generator_0.msgpack"
    rc = main([
        "score", "--train", str(data_file), "--generator", str(gen),
        "--base", "hbos", "--aggregation", "aom",
        "--subspaces", "16", "--out", str(tmp_path / "s.npy"),
    ])
    assert rc == 0
    s = np.load(tmp_path / "s.npy")
    assert s.shape == (96,) and np.all(np.isfinite(s))


def test_fit_shard_features_requires_mesh(data_file, tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(["fit", "--data", str(data_file), "--shard-features",
              "--epochs", "1", "--quiet"])


def test_export_subcommand_roundtrip(data_file, tmp_path):
    """CLI export -> serving.load_sampler produces the same masks as the
    estimator's generate_subspaces."""
    out = tmp_path / "run_exp"
    rc = main(["fit", "--data", str(data_file), "--variant", "no_kl",
               "--epochs", "1", "--batch-size", "32", "--quiet",
               "--out", str(out)])
    assert rc == 0
    gen = out / "models" / "generator_0.msgpack"
    art = tmp_path / "sampler.bin"
    rc = main(["export", "--generator", str(gen), "--ndims", "16",
               "--out", str(art)])
    assert rc == 0

    from vgan_tpu import VGAN_no_kl
    from vgan_tpu.serving import load_sampler, sample_masks

    model = VGAN_no_kl(verbose=False)
    model.load_models(gen, ndims=16)
    expected = model.generate_subspaces(32)
    got = sample_masks(load_sampler(art), nsubs=32,
                       latent_size=model._latent_size, seed=model.seed)
    np.testing.assert_array_equal(got, expected)


def test_score_heterogeneous_members(data_file, tmp_path):
    out = tmp_path / "m"
    rc = main(["fit", "--data", str(data_file), "--variant", "no_kl",
               "--epochs", "1", "--batch-size", "32", "--quiet",
               "--out", str(out)])
    assert rc == 0
    gen = out / "models" / "generator_0.msgpack"

    scores_path = tmp_path / "scores.npy"
    rc = main(["score", "--train", str(data_file), "--generator", str(gen),
               "--members", "knn,ecod", "--k", "5", "--subspaces", "32",
               "--out", str(scores_path)])
    assert rc == 0
    scores = np.load(scores_path)
    assert scores.shape == (96,)
    assert np.all(np.isfinite(scores))


def test_score_bases_literal_matches_registry():
    """The CLI's jax-free _SCORE_BASES literal must track the ensemble's
    actual native-base registry."""
    from vgan_tpu.cli import _SCORE_BASES
    from vgan_tpu.ensemble.od import _BASE_SCORERS, _DIM_BASES, _PARAM_BASES

    assert set(_SCORE_BASES) == {*_BASE_SCORERS, *_DIM_BASES, *_PARAM_BASES}


def test_score_members_whitespace_and_validation(tmp_path):
    """--members tolerates 'knn, lof' spacing and rejects unknown names
    with a parser error (not a raw constructor traceback)."""
    import pytest

    from vgan_tpu.cli import build_parser, main

    # unknown member must exit via the parser error path (SystemExit 2)
    np_file = tmp_path / "x.npy"
    np.save(np_file, np.random.default_rng(0).normal(size=(40, 4)).astype(np.float32))
    gen = tmp_path / "missing_gen.msgpack"
    with pytest.raises(SystemExit):
        main(["score", "--train", str(np_file), "--generator", str(gen),
              "--members", "knn, nosuchbase"])
