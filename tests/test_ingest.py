"""L0 ingest layer: GDC client/selection (fake transport), Otsu + tiling
goldens, description generation (fake LLM), streaming pipeline."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from gemm_gan_tpu.data.descriptions import (DESCRIPTION_MARKER, SYSTEM_PROMPT,
                                            format_metadata,
                                            generate_descriptions,
                                            parse_generation)
from gemm_gan_tpu.data.gdc import (DatasetIndex, GDCClient,
                                   build_expression_matrix, parse_rna_seq_tsv,
                                   select_rna_seq_files, select_tissue_slides,
                                   write_case_artifacts)
from gemm_gan_tpu.data.ingest import IngestPipeline
from gemm_gan_tpu.data.tiles import (extract_tiles, otsu_mask, otsu_threshold,
                                     load_valid_patches, save_valid_patches,
                                     tiles_from_array, valid_patches_for_slide)


# --------------------------------------------------------------------- GDC
class FakeResponse:
    def __init__(self, payload):
        self._payload = payload

    def raise_for_status(self):
        pass

    def json(self):
        return self._payload


class FakeSession:
    """Echoes canned hits; records the batched filter values."""

    def __init__(self, hits_by_endpoint):
        self.hits = hits_by_endpoint
        self.calls = []

    def post(self, url, json=None, timeout=None):
        endpoint = url.rsplit("/", 1)[-1]
        values = json["filters"]["content"]["value"]
        self.calls.append((endpoint, list(values)))
        hits = [h for h in self.hits.get(endpoint, [])
                if h.get("_match") in values]
        return FakeResponse({"data": {"hits": [
            {k: v for k, v in h.items() if k != "_match"} for h in hits]}})


def test_map_files_batches_of_100():
    ids = [f"id{i}" for i in range(250)]
    hits = [{"_match": i, "file_id": i, "file_name": f"{i}.tsv",
             "cases": [{"submitter_id": "s", "case_id": f"c-{i}",
                        "project": {"project_id": "TCGA-X"}}]} for i in ids]
    sess = FakeSession({"files": hits})
    client = GDCClient(session=sess, retries=1)
    df = client.map_files(ids)
    assert len(df) == 250
    assert [len(v) for _, v in sess.calls] == [100, 100, 50]
    assert set(df.columns) >= {"file_id", "file_name", "case_id", "project_id"}


def test_client_retries_then_raises():
    class FailingSession:
        def __init__(self):
            self.n = 0

        def post(self, url, json=None, timeout=None):
            self.n += 1
            raise ConnectionError("boom")

    sess = FailingSession()
    client = GDCClient(session=sess, retries=3, backoff=0.0)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        client.map_files(["x"])
    assert sess.n == 3


def _rna_entities():
    return pd.DataFrame([
        # case A: two files, newer one must win
        dict(file_id="f1", file_name="a_old.tsv", case_id="A",
             tissue_type="Tumor", tumor_descriptor="Primary",
             portion_submitter_id="pA", created_datetime="2020-01-01"),
        dict(file_id="f2", file_name="a_new.tsv", case_id="A",
             tissue_type="Tumor", tumor_descriptor="Primary",
             portion_submitter_id="pA", created_datetime="2021-01-01"),
        # case B: normal tissue -> dropped
        dict(file_id="f3", file_name="b.tsv", case_id="B",
             tissue_type="Normal", tumor_descriptor="Primary",
             portion_submitter_id="pB", created_datetime="2021-01-01"),
        # case C: metastatic -> dropped
        dict(file_id="f4", file_name="c.tsv", case_id="C",
             tissue_type="Tumor", tumor_descriptor="Metastatic",
             portion_submitter_id="pC", created_datetime="2021-01-01"),
    ])


def test_select_rna_seq_files_dedup_and_filters():
    kept = select_rna_seq_files(_rna_entities())
    assert kept["case_id"].tolist() == ["A"]
    assert kept["file_name"].tolist() == ["a_new.tsv"]


def test_select_tissue_slides_prefers_bottom_then_recent():
    ents = pd.DataFrame([
        dict(file_id="s1", file_name="x.id1.svs", case_id="A",
             tissue_type="Tumor", tumor_descriptor="Primary",
             section_location="TOP", portion_submitter_id="pA",
             created_datetime="2022-01-01"),
        dict(file_id="s2", file_name="x.id2.svs", case_id="A",
             tissue_type="Tumor", tumor_descriptor="Primary",
             section_location="BOTTOM", portion_submitter_id="pA",
             created_datetime="2020-01-01"),
        dict(file_id="s3", file_name="x.id3.svs", case_id="A",
             tissue_type="Tumor", tumor_descriptor="Primary",
             section_location="BOTTOM", portion_submitter_id="pA",
             created_datetime="2021-01-01"),
        # portion not in the RNA-selected set -> dropped
        dict(file_id="s4", file_name="y.id4.svs", case_id="B",
             tissue_type="Tumor", tumor_descriptor="Primary",
             section_location="BOTTOM", portion_submitter_id="pZ",
             created_datetime="2021-01-01"),
    ])
    kept = select_tissue_slides(ents, valid_portions=["pA"])
    # BOTTOM beats TOP; most recent bottom wins
    assert kept["file_name"].tolist() == ["x.id3.svs"]


def test_rna_tsv_parse_and_matrix(tmp_path):
    header = "# comment\ngene_id\tgene_name\tgene_type\tunstranded\tstranded_first\tstranded_second\ttpm_unstranded\tfpkm_unstranded\tfpkm_uq_unstranded\n"
    summary = "".join(f"N_{k}\t\t\t0\t0\t0\t0\t0\t0\n"
                      for k in ("unmapped", "multimapping", "noFeature", "ambiguous"))
    rows = ("g1\tG1\tprotein_coding\t5\t0\t0\t3.0\t0\t0\n"
            "g2\tG2\tlncRNA\t5\t0\t0\t9.0\t0\t0\n"
            "g3\tG3\tprotein_coding\t5\t0\t0\t1.0\t0\t0\n")
    for case in ("A", "B"):
        (tmp_path / f"{case}.tsv").write_text(header + summary + rows)
    s = parse_rna_seq_tsv(str(tmp_path / "A.tsv"))
    assert s.index.tolist() == ["g1", "g3"]  # protein_coding only
    assert s.tolist() == [3.0, 1.0]

    idx = DatasetIndex({c: {"rna_seq_file": f"{c}.tsv", "tissue_file": f"{c}.svs"}
                        for c in ("A", "B")})
    mat = build_expression_matrix(idx, str(tmp_path),
                                  str(tmp_path / "rna_seq.parquet"))
    assert mat.shape == (2, 2)
    np.testing.assert_allclose(mat.loc["A", "g1"], np.log2(4.0))
    assert (tmp_path / "rna_seq.parquet").exists()


def test_dataset_index_roundtrip_and_artifacts(tmp_path):
    rna = pd.DataFrame({"case_id": ["A", "B"], "file_name": ["a.tsv", "b.tsv"]})
    slides = pd.DataFrame({"case_id": ["B", "A"], "file_name": ["b.svs", "a.svs"]})
    idx = DatasetIndex.build(rna, slides)
    assert idx.case_ids() == ["A", "B"]
    p = str(tmp_path / "index.json")
    idx.save(p)
    assert DatasetIndex.load(p).cases == idx.cases
    write_case_artifacts(idx, {"A": {"disease_type": "x"}}, str(tmp_path))
    assert (tmp_path / "case_ids.txt").read_text().split() == ["A", "B"]
    assert json.loads((tmp_path / "metainfos.json").read_text())["A"] == {
        "disease_type": "x"}
    assert (tmp_path / "slides_info.parquet").exists()


# ------------------------------------------------------------------- tiles
def test_otsu_threshold_separates_bimodal(rng):
    g = np.concatenate([rng.normal(0.2, 0.02, 5000),
                        rng.normal(0.8, 0.02, 5000)])
    t = otsu_threshold(g)
    # any split strictly between the modes is an Otsu optimum (the
    # between-class variance is flat across the empty-bin plateau)
    assert 0.25 < t < 0.75


def test_otsu_mask_marks_dark_tissue(rng):
    img = np.full((64, 64, 3), 240, np.uint8)      # white background
    img[16:48, 16:48] = 100                        # dark tissue block
    mask = otsu_mask(img)
    assert mask[32, 32] == 1 and mask[0, 0] == 0
    frac = mask.mean()
    assert 0.2 < frac < 0.3                        # 32x32 of 64x64 = 0.25


def test_extract_tiles_fraction_filter():
    mask = np.zeros((100, 100), np.uint8)
    mask[:50, :50] = 1                             # tissue in top-left quadrant
    tiles = extract_tiles(mask, full_dims=(100, 100), tile_size=50,
                          background_thresh=0.8)
    assert (0, 0, 50, 50) in tiles                 # 100% tissue
    assert (50, 0, 50, 50) not in tiles            # 0% tissue
    # 20% threshold boundary: a tile with exactly 25% tissue passes
    mask2 = np.zeros((100, 100), np.uint8)
    mask2[:25, :50] = 1
    tiles2 = extract_tiles(mask2, (100, 100), 50, 0.8)
    assert (0, 0, 50, 50) in tiles2


def test_extract_tiles_downscaled_mask_matches_fullres():
    rng = np.random.RandomState(0)
    mask_full = (rng.rand(128, 128) < 0.5).astype(np.uint8)
    # 2x downscaled mask by max-pooling
    small = mask_full.reshape(64, 2, 64, 2).max(axis=(1, 3))
    t_full = extract_tiles(mask_full, (128, 128), 32, 0.8)
    t_small = extract_tiles(small, (128, 128), 32, 0.8)
    # same grid; near-identical keep decisions on random masks
    assert len(set(t_full) & set(t_small)) >= int(0.8 * len(t_full))


def test_valid_patches_roundtrip(tmp_path):
    img = np.full((64, 64, 3), 245, np.uint8)
    img[:32, :32] = 90
    vp = {"caseA": valid_patches_for_slide(img, (64, 64), tile_sizes=(32, 16))}
    path = str(tmp_path / "valid_patches.json")
    save_valid_patches(vp, path)
    loaded = load_valid_patches(path)
    assert loaded["caseA"][32] == [tuple(t) for t in vp["caseA"][32]]
    tiles = tiles_from_array(img, loaded["caseA"][32], 32)
    assert tiles.shape[1:] == (32, 32, 3)


# ------------------------------------------------------------ descriptions
def test_format_metadata_prunes_and_flattens():
    md = {
        "case_id": "drop", "submitter_id": "drop", "project": "drop",
        "samples": ["drop"],
        "disease_type": "Adenomas",
        "demographic": {"gender": "female", "demographic_id": "drop",
                        "days_to_birth": -100, "vital_status": None},
        "diagnoses": [{"x": 1}, {"y": 2}],
    }
    s = format_metadata(md)
    assert "drop" not in s
    assert "disease_type: Adenomas" in s
    assert "gender: female" in s
    assert "days_to_birth" not in s and "vital_status" not in s


def test_parse_generation_marker_semantics():
    gen = f"prompt echo {DESCRIPTION_MARKER} more {DESCRIPTION_MARKER} The real text."
    assert parse_generation(gen) == "The real text."
    # marker only appears once (echoed from prompt) -> last line fallback
    gen2 = f"prompt {DESCRIPTION_MARKER} echo\nThe last line."
    assert parse_generation(gen2) == "The last line."


def test_generate_descriptions_roundtrip(tmp_path):
    metainfos = {"A": {"disease_type": "X", "primary_site": "Lung"}, "B": None}

    def fake_llm(system_prompt, metadata_str):
        assert DESCRIPTION_MARKER in system_prompt
        assert "disease_type: X" in metadata_str
        return (f"sys {DESCRIPTION_MARKER} echo {DESCRIPTION_MARKER} "
                "A lung specimen description.")

    out_path = str(tmp_path / "descriptions.json")
    out = generate_descriptions(fake_llm, metainfos, out_path=out_path)
    assert out == {"A": "A lung specimen description.", "B": ""}
    assert json.loads(open(out_path).read()) == out


# ---------------------------------------------------------------- pipeline
def test_ingest_pipeline_end_to_end(tmp_path, rng):
    slide_dir = tmp_path / "slides"
    slide_dir.mkdir()

    def download(case_id):
        if case_id == "bad":
            return None
        p = slide_dir / f"{case_id}.bin"
        p.write_bytes(b"x")
        return str(p)

    def tile(case_id, path):
        if case_id == "explode":
            raise ValueError("corrupt slide")
        return rng.rand(4, 8, 8, 3).astype(np.float32)

    def embed(tiles):
        if tiles.ndim != 4:
            raise ValueError("bad tiles")
        return tiles.reshape(tiles.shape[0], -1)[:, :6]

    out_dir = str(tmp_path / "cache")
    pipe = IngestPipeline(download, tile, embed, out_dir,
                          max_download_workers=2, max_in_flight=3)
    results = pipe.run(["c1", "c2", "bad", "explode", "c3"])
    by_case = {r.case_id: r for r in results}
    assert by_case["c1"].status == "ok" and by_case["c1"].n_patches == 4
    assert by_case["bad"].status == "download_failed"
    assert by_case["explode"].status == "error"
    assert np.load(os.path.join(out_dir, "c2.npy")).shape == (4, 6)
    # slides deleted after embedding; failed tile files may remain
    assert not (slide_dir / "c1.bin").exists()

    # idempotent rerun skips cached cases
    results2 = pipe.run(["c1", "c2"])
    assert {r.status for r in results2} == {"skipped"}

    info_path = str(tmp_path / "tiles_info.json")
    pipe.write_tiles_info(info_path)
    assert json.loads(open(info_path).read())["c1"] == 4


def test_download_failure_leaves_no_partial_file(tmp_path):
    """A mid-stream drop must not leave a truncated file that idempotent
    re-runs would treat as complete."""
    from gemm_gan_tpu.data.gdc import GDCClient

    class DropSession:
        def get(self, url, stream=True, timeout=None):
            class R:
                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    return False

                def raise_for_status(self):
                    pass

                def iter_content(self, chunk_size):
                    yield b"partial"
                    raise ConnectionError("dropped")
            return R()

    client = GDCClient(session=DropSession(), retries=2, backoff=0.0)
    dest = str(tmp_path / "f.tsv")
    assert client.download_file("fid", dest) is False
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".part")
