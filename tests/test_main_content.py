"""Link-density main-content extraction (stages/extract.main_content_one,
Kohlschütter et al. 2010 heuristic): handcrafted density cases + the
planted block-page round trip."""
from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from dupers_ray.stages.extract import extract_main_content, main_content_one
from dupers_ray.synth import synth_doc_html_blocks


def test_links_only_blocks_drop_prose_keeps():
    html = (
        b'<html><body>'
        b'<nav><a href="/">home</a> <a href="/x">about</a></nav>'
        b"<p>real article text goes here</p>"
        b'<footer><a href="/c">contact</a></footer>'
        b"</body></html>"
    )
    assert main_content_one(html) == "real article text goes here"


def test_density_threshold_is_on_visible_chars():
    # "click here" linked (10 visible chars) inside 30 visible chars of
    # prose -> density 1/3 <= 0.5, kept WITH its anchor text; a block
    # that is 2/3 link text drops.
    mixed = b'<p>read the <a href="/d">click here</a> docs for it</p>'
    assert main_content_one(mixed) == "read the click here docs for it"
    linky = b'<p>ad <a href="/d">very long anchor text</a></p>'
    assert main_content_one(linky) == ""
    # threshold is a parameter
    assert main_content_one(linky, max_link_density=1.0) == (
        "ad very long anchor text"
    )


def test_edge_inputs():
    assert main_content_one(None) == ""
    assert main_content_one(b"") == ""
    assert main_content_one(b"<p>   </p>") == ""
    # script/style/comment content never counts as text
    assert (
        main_content_one(b"<p><script>var x=1;</script>hi</p>") == "hi"
    )
    # entity decoding matches extract_text_one's canon
    assert main_content_one(b"<p>a &amp; b</p>") == "a & b"


def test_planted_blocks_round_trip():
    docs = pa.table(
        {"doc_id": [0, 1, 4, 7], "text": ["t zero", "t one", "t four", ""]}
    )
    pages = rd.from_arrow(docs).map_batches(
        synth_doc_html_blocks, batch_format="pyarrow"
    )
    out = {
        r["doc_id"]: r["main_text"]
        for r in pages.map_batches(
            extract_main_content, batch_format="pyarrow"
        ).take_all()
    }
    assert out == {
        0: "t zero promo 0 extra",
        1: "t one",
        4: "t four promo 4 extra",
        7: "",
    }


def test_fuzz_total_on_garbage_bytes():
    """Total on ANY input: random/truncated/bit-flipped html never
    crashes main_content_one or the noindex regex (the archive-sniffer
    fuzz contract, applied to the html kernels)."""
    import numpy as np

    from dupers_ray.stages.filters import _NOINDEX_RE
    import pyarrow.compute as pc

    rng = np.random.default_rng(7)
    blobs = [bytes(rng.integers(0, 256, rng.integers(0, 400))) for _ in range(60)]
    blobs += [
        b"<p" * 50, b"<a href=\"" * 30, b"<meta name=robots" * 20,
        b"<html>" + bytes(rng.integers(0, 256, 100)) + b"</html>",
    ]
    for b in blobs:
        s = main_content_one(b)
        assert isinstance(s, str)
    arr = pa.array(blobs, pa.binary())
    m = pc.match_substring_regex(arr, _NOINDEX_RE)
    assert len(m) == len(blobs)


def test_charset_sniff_and_transcode():
    from dupers_ray.stages.extract import sniff_charset, transcode_html

    text = "héllo wörld — café"
    cases = [
        (("<p>" + text + "</p>").encode("utf-8"), "utf-8"),
        (b"\xef\xbb\xbf" + ("<p>" + text + "</p>").encode("utf-8"),
         "utf-8-sig"),
        (("<p>" + text + "</p>").encode("utf-16"), "utf-16-le"),
        (("<p>" + text + "</p>").encode("utf-16-be"), "utf-8"),  # no BOM
        (('<meta charset="ISO-8859-1"><p>' + text.replace("—", "-")
          + "</p>").encode("latin-1"), "latin-1"),
        (("<meta http-equiv=\"Content-Type\" content=\"text/html; "
          "charset=windows-1252\"><p>" + text + "</p>")
         .encode("cp1252"), "windows-1252"),
        (b"", "utf-8"),
        (None, "utf-8"),
    ]
    for raw, want in cases:
        assert sniff_charset(raw) == want, (raw[:30], want)

    t = pa.table({"html": pa.array(
        [c for c, _ in cases], pa.binary()
    )})
    out = transcode_html(t)
    # every decodable page round-trips to the same utf-8 text bytes
    from dupers_ray.stages.extract import extract_text_one

    got = [extract_text_one(b) for b in out.column("html").to_pylist()]
    assert got[:3] == [text, text, text]
    assert got[4] == text.replace("—", "-") and got[5] == text
    assert got[6] == "" and got[7] == ""
    # BOM never leaks into the transcoded bytes
    assert not out.column("html").to_pylist()[2].startswith(
        b"\xef\xbb\xbf"
    )
