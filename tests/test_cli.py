"""The python -m product_etl_spark CLI: every subcommand drives its
pipeline end-to-end with offline kernels (hermetic, DRY_RUN-style)."""

from __future__ import annotations

import pytest

from product_etl_spark.__main__ import main


@pytest.mark.slow
def test_ingest_translate_enrich_cli(spark, tmp_path, capsys):
    import test_ingest as TI

    csv = tmp_path / "raw.csv"
    csv.write_text(TI.HEADER + "\n" + "\n".join(TI.ROWS), encoding="utf-8")
    wh = str(tmp_path / "wh")

    # dry-run reports counts, writes nothing
    assert main(["ingest", "--csv", str(csv), "--warehouse", wh, "--dry-run"]) == 0
    out = capsys.readouterr().out
    # pre-merge builder counts: the fixture carries one duplicate SKU
    # that the MERGE collapses on a real write
    assert "product\t5" in out and "dry-run" in out
    import os

    assert not os.path.exists(f"{wh}/product")

    # real ingest writes the warehouse
    assert main(["ingest", "--csv", str(csv), "--warehouse", wh]) == 0
    assert spark.read.parquet(f"{wh}/product").count() == 4

    # translation sweep with the offline kernel
    assert main(["translate", "--warehouse", wh]) == 0
    tr = spark.read.parquet(f"{wh}/translations")
    assert tr.filter("lang_code = 'en'").count() > 0

    # enrichment from a products parquet, bounded by --limit
    pp = str(tmp_path / "prod_html")
    spark.createDataFrame(
        [("p-1", '<img src="https://x/a.jpg">'), ("p-2", '<img src="https://x/b.jpg">')],
        "product_id string, details_html string",
    ).write.parquet(pp)
    assert main([
        "enrich", "--products", pp, "--stage-root", str(tmp_path / "st"),
        "--limit", "1",
    ]) == 0
    out = capsys.readouterr().out
    assert "image_urls\t1" in out


@pytest.mark.slow
def test_curate_and_profile_cli(spark, tmp_path, capsys, sf_dir):
    docs = f"{sf_dir}/documents.parquet"
    outdir = str(tmp_path / "cur")
    assert main(["curate", "--input", docs, "--output", outdir]) == 0
    out = capsys.readouterr().out
    assert "train\t" in out
    assert spark.read.parquet(f"{outdir}/train").count() > 0

    assert main([
        "profile", "--table", docs, "--cols", "doc_id,lang",
    ]) == 0
    out = capsys.readouterr().out
    assert "doc_id\trows=" in out and "lang\trows=" in out

    with pytest.raises(SystemExit):
        main(["nope"])
