"""INI-configured chain (reference user-extension surface): param binding,
Achieves/Presupposes validation, and equivalence with the hand-built
flagship chain."""

import pandas as pd
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_default_ini_equals_clean_documents(ray_session):
    from texrex_ray.pipelines.clean_documents import clean_documents
    from texrex_ray.pipelines.configchain import chain_from_ini

    ini = """
    [texrex]
    chain = SecondPass, Normalizer, Tokenizer, Quality, Assessor, Fingerprints, DropTokens
    """
    a = chain_from_ini(_docs(), ini).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = clean_documents(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # minhash columns are list-valued; compare scalar columns exactly
    scal = [c for c in a.columns if a[c].dtype != object or isinstance(a[c].iloc[0], str)]
    assert sorted(a.columns) == sorted(b.columns)
    pd.testing.assert_frame_equal(a[scal], b[scal])


def test_param_binding(ray_session):
    from texrex_ray.pipelines.configchain import chain_from_ini

    ini = """
    [texrex]
    chain = SecondPass, Normalizer, Tokenizer, Fingerprints
    batch_size = 128

    [Fingerprints]
    minhash_k = 8
    """
    out = chain_from_ini(_docs().limit(20), ini).to_pandas()
    assert all(len(v) == 8 for v in out["minhash"])


def test_misordered_chain_names_offender(ray_session):
    from texrex_ray.pipelines.configchain import ChainConfigError, parse_chain

    with pytest.raises(ChainConfigError, match="Fingerprints presupposes.*tokens.*removed"):
        parse_chain(
            "[texrex]\nchain = SecondPass, Normalizer, Tokenizer, DropTokens, Fingerprints\n"
        )
    with pytest.raises(ChainConfigError, match="Tokenizer presupposes.*normalized.*Normalizer"):
        parse_chain("[texrex]\nchain = SecondPass, Tokenizer\n")


def test_unknown_stage_and_param(ray_session):
    from texrex_ray.pipelines.configchain import ChainConfigError, parse_chain

    with pytest.raises(ChainConfigError, match="unknown stage 'Frobnicator'"):
        parse_chain("[texrex]\nchain = Frobnicator\n")
    with pytest.raises(ChainConfigError, match="no parameter 'bogus'"):
        parse_chain("[texrex]\nchain = Assessor\n[Assessor]\nbogus = 1\n")
    with pytest.raises(ChainConfigError, match="expected float"):
        parse_chain("[texrex]\nchain = Assessor\n[Assessor]\nthreshold = abc\n")


def test_assessor_actor_pool_param(ray_session):
    """concurrency > 0 switches the Assessor to an actor pool; output is
    identical to the task form."""
    from texrex_ray.pipelines.configchain import chain_from_ini

    base = "[texrex]\nchain = SecondPass, Normalizer, Tokenizer, Quality, Assessor\n"
    a = chain_from_ini(_docs(), base).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        chain_from_ini(_docs(), base + "[Assessor]\nconcurrency = 2\n")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_cli_config(tmp_path, ray_session):
    from texrex_ray.__main__ import main

    ini = tmp_path / "chain.ini"
    ini.write_text(
        "[texrex]\nchain = SecondPass, Normalizer, Tokenizer, Quality\n"
    )
    out = tmp_path / "out"
    rc = main(
        ["texrex", f"{SF}/documents.parquet", str(out), "--config", str(ini)]
    )
    assert rc == 0
    got = ray.data.read_parquet(str(out)).to_pandas()
    assert len(got) == 500 and "n_tokens" in got.columns
