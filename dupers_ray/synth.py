"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §1).

Seeded, self-contained generator of Common-Crawl-style web pages matching
BASELINE.json:input_hint — (url, warc_ts, html, text, lang) — with planted
ground truth:

- exact-dup clusters (~10% of rows, sizes 2-5): identical html/text bytes,
  distinct urls
- near-dup clusters (~10%, sizes 2-4): shared template with a controlled
  token-edit rate r in [0.5%, 3%]. With k=5 word shingles a token edit
  kills ~k shingles, so member↔template shingle Jaccard ≈
  (1-r)^k / (2-(1-r)^k) ∈ [~0.75, ~0.97] — comfortably above the default
  LSH verify threshold (0.6) with ~4σ margin at 128 permutations.
  Member↔member pairs can dip lower; they cluster transitively via the
  template row.
- boilerplate rows (~2%): one large shared template block + tiny unique tail
  (exercises LSH hot-band skew)
- uniques: independent token sequences
- edge rows: empty, whitespace-only, non-ASCII, very long

``html`` is built so that ``extract.extract_text_one(html) == text`` exactly
(the parity invariant). Ground-truth cluster membership is returned alongside
so tests can compute recall without an external oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from dupers_ray.stages.extract import extract_text_one

_WORDS = (
    "data batch stream shard block shuffle merge index digest token page "
    "crawl fetch parse render cache store query scan filter group sort join "
    "hash band row column table value key count total byte file path url "
    "node edge graph label round phase stage write read spill limit slice "
    "web text corpus near exact dup clean fast slow small large wide tall"
).split()


@dataclass
class SynthResult:
    pages: pa.Table          # (url, warc_ts, html, text, lang)
    truth: pa.Table          # (url, cluster_id, kind) — kind in {exact, near, boiler, unique, edge}


def _sentence(rng: np.random.Generator, n: int) -> list[str]:
    return [_WORDS[i] for i in rng.integers(0, len(_WORDS), n)]


def _html_wrap(text: str, title: str) -> bytes:
    # extract_text_one strips tags/scripts and collapses whitespace; the title
    # becomes leading tokens, so include it in `text` computation by re-running
    # the extractor on the wrapped bytes (callers use the returned text).
    body = (
        f"<html><head><title>{title}</title>"
        f"<script>var x = 1;</script><style>p {{color: red}}</style></head>"
        f"<body><!-- gen --><p>{text}</p></body></html>"
    )
    return body.encode("utf-8")


def synth_pages(
    n: int = 2000,
    seed: int = 42,
    *,
    exact_frac: float = 0.10,
    near_frac: float = 0.10,
    boiler_frac: float = 0.02,
    edit_rate_lo: float = 0.005,
    edit_rate_hi: float = 0.03,
    doc_len: int = 220,
) -> SynthResult:
    rng = np.random.default_rng(seed)
    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    tss: list[int] = []
    cluster_ids: list[int] = []
    kinds: list[str] = []

    base_ts = 1_700_000_000_000_000  # fixed epoch micros; no wall clock
    cluster_seq = 0
    row = 0

    def add(tokens_or_text, kind: str, cid: int, lang: str = "en") -> None:
        nonlocal row
        text_src = (
            " ".join(tokens_or_text) if isinstance(tokens_or_text, list) else tokens_or_text
        )
        url = f"https://site{cid % 97:02d}.example.com/{kind}/{row:07d}.html"
        title = f"{kind} {cid}"
        html = _html_wrap(text_src, title)
        urls.append(url)
        htmls.append(html)
        texts.append(extract_text_one(html))
        langs.append(lang)
        tss.append(base_ts + row * 1_000_000)
        cluster_ids.append(cid)
        kinds.append(kind)
        row += 1

    n_exact_rows = int(n * exact_frac)
    n_near_rows = int(n * near_frac)
    n_boiler_rows = int(n * boiler_frac)
    n_edge = 6 if n >= 100 else 0
    n_unique = max(0, n - n_exact_rows - n_near_rows - n_boiler_rows - n_edge)

    # exact-dup clusters: identical token sequence (and identical html ⇒
    # identical text bytes), distinct urls
    made = 0
    while made < n_exact_rows:
        size = int(rng.integers(2, 6))
        size = max(2, min(size, n_exact_rows - made))
        toks = _sentence(rng, doc_len)
        cluster_seq += 1
        for _ in range(size):
            add(toks, "exact", cluster_seq)
        made += size

    # near-dup clusters: template + per-member token edits at a controlled rate
    made = 0
    while made < n_near_rows:
        size = int(rng.integers(2, 5))
        size = max(2, min(size, n_near_rows - made))
        template = _sentence(rng, doc_len)
        cluster_seq += 1
        add(template, "near", cluster_seq)
        for _ in range(size - 1):
            rate = rng.uniform(edit_rate_lo, edit_rate_hi)
            toks = list(template)
            n_edits = max(1, int(len(toks) * rate))
            pos = rng.choice(len(toks), size=n_edits, replace=False)
            for p in pos:
                toks[p] = _WORDS[int(rng.integers(0, len(_WORDS)))]
            add(toks, "near", cluster_seq)
        made += size

    # boilerplate: one big shared block + tiny unique tail (hot LSH bands,
    # but NOT near-dups of each other at Jaccard >= threshold necessarily)
    boiler_block = _sentence(rng, doc_len * 2)
    for _ in range(n_boiler_rows):
        cluster_seq += 1
        tail = _sentence(rng, max(4, doc_len // 8))
        add(boiler_block + tail, "boiler", cluster_seq)

    # uniques
    for _ in range(n_unique):
        cluster_seq += 1
        add(_sentence(rng, doc_len), "unique", cluster_seq)

    # edge rows: empty, whitespace-only html body, non-ascii, very long
    if n_edge:
        cluster_seq += 1
        add("", "edge", cluster_seq)
        cluster_seq += 1
        urls.append(f"https://edge.example.com/ws/{row:07d}.html")
        htmls.append(b"<html><body>   \n\t  </body></html>")
        texts.append(extract_text_one(htmls[-1]))
        langs.append("en")
        tss.append(base_ts + row * 1_000_000)
        cluster_ids.append(cluster_seq)
        kinds.append("edge")
        row += 1
        cluster_seq += 1
        add("díaçrítics straße 東京 ناتج データ " * 30, "edge", cluster_seq, lang="ja")
        cluster_seq += 1
        add(_sentence(rng, doc_len * 40), "edge", cluster_seq)  # very long
        cluster_seq += 1
        add(_sentence(rng, 3), "edge", cluster_seq)  # very short
        cluster_seq += 1
        add("&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "edge", cluster_seq)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "cluster_id": pa.array(cluster_ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return SynthResult(pages=pages, truth=truth)


def write_pages_parquet(
    path: str, n: int = 2000, seed: int = 42, *, files: int = 16, **kw
) -> SynthResult:
    """Synthesize and persist pages as a MULTI-FILE parquet dataset under
    ``path``/pages/ (one read task per file — a single file serializes the
    read stage), plus ``path``/truth.parquet."""
    import os
    import pyarrow.parquet as pq

    res = synth_pages(n=n, seed=seed, **kw)
    pages_dir = os.path.join(path, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    nrows = res.pages.num_rows
    files = max(1, min(files, nrows))
    step = (nrows + files - 1) // files
    for i in range(files):
        chunk = res.pages.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{i:05d}.parquet"))
    pq.write_table(res.truth, os.path.join(path, "truth.parquet"))
    return res


def synth_doc_images(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: int = 40,
    size: tuple[int, int] = (48, 64),
) -> "pa.Table":
    """Deterministic synthetic image per document — the multimodal test
    corpus (no external data, per the graft contract): the sha256 of the
    text's first ``prefix`` chars seeds a low-frequency 'photo-like' RGB
    mixture, encoded as PNG for even ids and baseline JPEG (q75) for odd
    ids. Identical text prefixes therefore yield perceptually identical
    images ACROSS different encodings — planting ground-truth clusters
    that the pHash pipeline must recover and a DuckDB oracle can state
    as min(doc_id) per prefix group. Output: (id, payload binary)."""
    import hashlib

    from dupers_ray.functions.jpeg import encode_jpeg
    from dupers_ray.functions.png import encode_png

    h, w = size
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    payloads: list[bytes] = []
    for doc_id, text in zip(ids, texts):
        key = hashlib.sha256((text or "")[:prefix].encode()).digest()
        # scene 0 of the shared generator (seeding identical: +0)
        arr = _photo_scene(key, 0, h, w)
        if doc_id % 2 == 0:
            payloads.append(encode_png(arr))
        else:
            payloads.append(encode_jpeg(arr, quality=75))
    return pa.table({
        id_col: batch.column(id_col),
        "payload": pa.array(payloads, pa.binary()),
    })


def synth_doc_html(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int = 500,
    nofollow: bool = False,
    feeds: bool = False,
) -> "pa.Table":
    """Deterministic synthetic html page per document, with
    ARITHMETICALLY planted outlinks so a DuckDB oracle can restate the
    extracted link graph without parsing html: doc i lives on
    ``host{i}.example`` and links to ``host{(i*31 + 7*j + 1) % n_docs}
    .example`` for j in range(1 + i % 3), with anchor text
    ``t{(i + j) % 7}`` (planted arithmetic too, so anchor_profiles has a
    value oracle). The page also carries decoy relative/ftp hrefs that a
    correct extractor must DROP. With ``nofollow=True`` every page gains
    a ``tracker{i % 13}.example`` link that carries ``rel="nofollow"``
    on EVEN ids only — a nofollow-honoring extractor must keep exactly
    the odd-id tracker edges. Output: (id, src_host, html binary)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    hosts: list[str] = []
    pages: list[bytes] = []
    for i, text in zip(ids.tolist(), texts):
        links = "".join(
            f'<a href="https://host{(i * 31 + 7 * j + 1) % n_docs}.example'
            f'/p/{i}-{j}" rel="x">t{(i + j) % 7}</a>'
            for j in range(1 + i % 3)
        )
        tracker = ""
        if nofollow:
            rel = ' rel="nofollow"' if i % 2 == 0 else ""
            tracker = (
                f'<a href="https://tracker{i % 13}.example/t"{rel}>sp</a>'
            )
        feed = ""
        if feeds:
            # i%3==0 rss (plain), ==1 atom (messy attr order/case),
            # ==2 no feed but an hreflang-alternate DECOY that a feed
            # extractor must not match (rel=alternate, no feed type)
            if i % 3 == 0:
                feed = (
                    f'<link rel="alternate" type="application/rss+xml" '
                    f'href="https://host{i}.example/feed.xml">'
                )
            elif i % 3 == 1:
                feed = (
                    f"<LINK TYPE='application/ATOM+xml' "
                    f"HREF='https://host{i}.example/atom' REL=alternate>"
                )
            else:
                feed = (
                    f'<link rel="alternate" hreflang="de" '
                    f'href="https://host{i}.example/de">'
                )
        body = (
            f'<html><head><a href="/relative/nav">skip</a>{feed}</head>'
            f'<body><p>{(text or "")[:80]}</p>{links}{tracker}'
            f'<a href="ftp://legacy.example/f">old</a></body></html>'
        )
        hosts.append(f"host{i}.example")
        pages.append(body.encode())
    return pa.table({
        id_col: batch.column(id_col),
        "src_host": pa.array(hosts, pa.string()),
        "html": pa.array(pages, pa.binary()),
    })


def synth_og_pages(
    batch: "pa.Table", *, id_col: str = "doc_id",
) -> "pa.Table":
    """Pages with ARITHMETICALLY planted OpenGraph / Twitter-card meta
    tags so a DuckDB oracle can state the extraction truth without
    parsing html. Doc i carries:

    - ``og:title = 'Title {i%50}'`` — clean double-quoted tag;
    - ``og:image = 'https://cdn{i%7}.example/img{i%11}.png'`` — MESSY
      tag: uppercase <META>, attributes reversed (content before
      property), single quotes / unquoted;
    - ``twitter:card = 'summary{i%4}'`` on ``i % 3 == 0`` only.

    Decoys a correct extractor must drop: ``<meta name=description>``,
    ``<meta charset>``, an ``og:``-lookalike inside visible text, and a
    ``<link>`` tag. Output: (id, html binary)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    pages: list[bytes] = []
    for i in ids.tolist():
        card = (
            f'<meta name="twitter:card" content="summary{i % 4}">'
            if i % 3 == 0 else ""
        )
        body = (
            f'<html><head><meta charset="utf-8">'
            f'<meta property="og:title" content="Title {i % 50}">'
            f"<META CONTENT='https://cdn{i % 7}.example/img{i % 11}.png' "
            f"PROPERTY=og:image>{card}"
            f'<meta name="description" content="not a card">'
            f'<link rel="canonical" href="https://host{i}.example/">'
            f"</head><body><p>og:title is not a tag here</p></body></html>"
        )
        pages.append(body.encode())
    return pa.table({
        id_col: batch.column(id_col),
        "html": pa.array(pages, pa.binary()),
    })


def synth_amp_pages(
    batch: "pa.Table", *, id_col: str = "doc_id",
) -> "pa.Table":
    """AMP-mirror fixture with planted identities. base = id//3, v = id%3:

    - v=0 canonical page at ``https://hosta{base}.example/art{base}``,
      declaring ``rel=amphtml`` → the /amp URL (messy attr order on even
      base);
    - v=1 AMP page at ``…/art{base}/amp``: declares ``rel=canonical``
      back ONLY when base is even — odd-base AMP pages declare NOTHING
      and can be unified only via the canonical page's amphtml edge;
    - v=2 bystander on its own host, no declarations.

    Planted truth: v∈{0,1} unify (cluster = id - id%3), v=2 is a
    singleton. Output: (id, url, html binary)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    urls: list[str] = []
    pages: list[bytes] = []
    for i in ids.tolist():
        base, v = i // 3, i % 3
        canon = f"https://hosta{base}.example/art{base}"
        amp = f"{canon}/amp"
        if v == 0:
            urls.append(canon)
            link = (
                f"<LINK HREF='{amp}' REL=amphtml>" if base % 2 == 0
                else f'<link rel="amphtml" href="{amp}">'
            )
            body = f"<html><head>{link}</head><body>article {base}</body></html>"
        elif v == 1:
            urls.append(amp)
            link = (
                f'<link rel="canonical" href="{canon}">' if base % 2 == 0
                else ""
            )
            body = f"<html><head>{link}</head><body>article {base} amp</body></html>"
        else:
            urls.append(f"https://hostb{base}.example/other{base}")
            body = f"<html><body>other {base}</body></html>"
        pages.append(body.encode())
    return pa.table({
        id_col: batch.column(id_col),
        "url": pa.array(urls, pa.string()),
        "html": pa.array(pages, pa.binary()),
    })


def synth_doc_html_blocks(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Deterministic block-structured html page per document for the
    main-content extractor: a links-only <nav> (anchor density 1.0 —
    boilerplate), the doc text in <p> (density 0 — content), an
    ARITHMETICALLY planted low-link promo block ``promo {i} extra`` for
    doc_id % 4 == 0 (content — must be kept), and a links-only <footer>.
    The oracle restates the planted arithmetic: main_text =
    ltrim(text || CASE doc_id%4 WHEN 0 THEN ' promo '||doc_id||' extra'
    END). Docs with doc_id % 7 == 3 additionally carry
    ``<meta name="robots" content="noindex, nofollow">`` in <head>
    (zero visible chars — main_content is unaffected) for the
    drop_noindex filter's oracle. Output: (id, html binary)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    pages: list[bytes] = []
    for i, text in zip(ids.tolist(), texts):
        promo = (
            f"<div>promo {i} extra</div>" if i % 4 == 0 else ""
        )
        robots = (
            '<meta name="robots" content="noindex, nofollow">'
            if i % 7 == 3 else ""
        )
        body = (
            f'<html><head>{robots}</head><body>'
            f'<nav><a href="/">home</a> <a href="/about">about</a></nav>'
            f'<p>{text or ""}</p>{promo}'
            f'<footer><a href="/contact">contact</a> '
            f'<a href="/terms">terms</a></footer>'
            f"</body></html>"
        )
        pages.append(body.encode())
    return pa.table({
        id_col: batch.column(id_col),
        "html": pa.array(pages, pa.binary()),
    })


def _photo_scene(key: bytes, scene: int, h: int, w: int) -> "np.ndarray":
    """Low-frequency 'photo-like' RGB array deterministically derived
    from (sha256 key, scene index) — evaluating a continuous sinusoid
    mixture on ANY (h, w) grid, so two renderings of the same scene at
    different resolutions depict the same image (pHash-invariant)."""
    rng = np.random.default_rng(
        np.frombuffer(key[:16], np.uint64) + np.uint64(scene)
    )
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        for _ in range(4):
            fy, fx = rng.uniform(0.5, 3, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img[..., c] += rng.uniform(20, 60) * np.sin(
                2 * np.pi * (fy * yy / h + fx * xx / w) + ph
            )
    img = img - img.min()
    return (img / max(img.max(), 1e-9) * 255).astype(np.uint8)


def synth_doc_videos(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: int = 40,
    n_scenes: int = 3,
) -> "pa.Table":
    """Deterministic synthetic DVID video per document (the video leg of
    the multimodal triad): the text-prefix sha256 seeds ``n_scenes``
    photo-like scene images; even ids render 6 PNG frames at 48x64 /
    10 fps, odd ids 9 JPEG-q75 frames at 36x48 / 15 fps — same scene
    SEQUENCE, different codec, frame count, fps and resolution. Docs
    sharing a prefix must therefore cluster under the scene-sampled
    pHash majority vote (stages/videohash.py), stated by the DuckDB
    oracle as min(doc_id) per prefix group."""
    import hashlib

    from dupers_ray.functions.jpeg import encode_jpeg
    from dupers_ray.functions.png import encode_png
    from dupers_ray.stages.videohash import encode_video

    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    payloads: list[bytes] = []
    for doc_id, text in zip(ids, texts):
        key = hashlib.sha256((text or "")[:prefix].encode()).digest()
        if doc_id % 2 == 0:
            n_frames, fps, (h, w), enc = 6, 10, (48, 64), encode_png
        else:
            n_frames, fps, (h, w) = 9, 15, (36, 48)
            enc = lambda a: encode_jpeg(a, quality=75)  # noqa: E731
        scene_png = [enc(_photo_scene(key, s, h, w)) for s in range(n_scenes)]
        frames = [
            scene_png[min(i * n_scenes // n_frames, n_scenes - 1)]
            for i in range(n_frames)
        ]
        payloads.append(encode_video(frames, fps=fps))
    return pa.table({
        id_col: batch.column(id_col),
        "payload": pa.array(payloads, pa.binary()),
    })


def synth_doc_audio(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: int = 40,
    duration_s: float = 0.5,
) -> "pa.Table":
    """Deterministic synthetic WAV clip per document (audio counterpart
    of synth_doc_images): the text-prefix sha256 seeds 6 distinct sine
    frequencies on a 50 Hz grid in [300, 3950] Hz; even ids render at
    8 kHz, odd ids at 44.1 kHz with different amplitudes — same tonal
    content, different bytes/rates/gains. Docs sharing a prefix must
    therefore land in one cluster under the rate-invariant spectral
    fingerprint (stages/audiohash.py), which a DuckDB oracle states as
    min(doc_id) per prefix group. Output: (id, payload binary)."""
    import hashlib

    from dupers_ray.stages.audiohash import encode_wav_pcm16

    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    payloads: list[bytes] = []
    for doc_id, text in zip(ids, texts):
        key = hashlib.sha256((text or "")[:prefix].encode()).digest()
        rng = np.random.default_rng(np.frombuffer(key[:16], np.uint64))
        # 6 peaks on a 50 Hz grid in [300, 3950]: C(74, 6) ~ 2e8 distinct
        # constellations — birthday-safe for corpora of ~1e4 distinct
        # prefixes (4 peaks x 100 Hz collided at sf0.01 already)
        freqs = 50.0 * rng.choice(np.arange(6, 80), size=6, replace=False)
        rate = 8000 if doc_id % 2 == 0 else 44100
        amp = 0.2 if doc_id % 2 == 0 else 0.11
        t = np.arange(int(rate * duration_s)) / rate
        x = sum(amp * (1.0 - 0.1 * k) * np.sin(2 * np.pi * f * t)
                for k, f in enumerate(freqs))
        payloads.append(encode_wav_pcm16(x, rate))
    return pa.table({
        id_col: batch.column(id_col),
        "payload": pa.array(payloads, pa.binary()),
    })


def synth_doc_mp3(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    nchars_col: str = "n_chars",
) -> "pa.Table":
    """Deterministic synthetic MPEG-1 Layer III frame stream per document
    (container-metadata counterpart of synth_doc_audio): frame count,
    sample rate and CBR/VBR mode derive arithmetically from (doc_id,
    n_chars), so a DuckDB oracle can restate the EXPECTED parse of
    stages/multimodal.parse_mp3_frames as plain column arithmetic — the
    Ray path must actually walk the binary frame headers to recover it.
    Odd ids get an ID3v2 tag prefix (exercises the syncsafe skip); frame
    bodies are zeros (no false sync bytes). Output: (id, payload)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    nch = batch.column(nchars_col).to_numpy(zero_copy_only=False).astype(np.int64)
    payloads: list[bytes] = []
    for doc_id, nc in zip(ids, nch):
        n_frames = 3 + int(nc) % 8
        sr_idx = 0 if doc_id % 2 == 0 else 2
        rate = 44100 if sr_idx == 0 else 32000
        mode = doc_id % 3  # 0: CBR 128, 1: CBR 64, 2: VBR 64/128
        frames = []
        for j in range(n_frames):
            if mode == 0:
                idx, kbps = 9, 128
            elif mode == 1:
                idx, kbps = 5, 64
            else:
                idx, kbps = (5, 64) if j % 2 == 0 else (9, 128)
            flen = 144 * kbps * 1000 // rate
            frames.append(
                bytes([0xFF, 0xFB, (idx << 4) | (sr_idx << 2), 0x00])
                + bytes(flen - 4)
            )
        prefix = b""
        if doc_id % 2 == 1:
            sz = int(doc_id) % 100  # < 128, one syncsafe byte
            prefix = b"ID3" + bytes([3, 0, 0, 0, 0, 0, sz]) + bytes(sz)
        payloads.append(prefix + b"".join(frames))
    return pa.table({
        id_col: batch.column(id_col),
        "payload": pa.array(payloads, pa.binary()),
    })


def synth_sitemap_pages(
    batch: "pa.Table",
    *,
    n_docs: int,
    n_hosts: int = 20,
    id_col: str = "id",
) -> "pa.Table":
    """Deterministic sitemap.xml page per host (driven by a
    ``ray.data.range(n_hosts)`` dataset so generation is itself
    distributed): host h lists ``https://host{h}.example/p/{k}`` for
    every crawled doc k ≡ h (mod n_hosts) with k % 3 != 2 (so a third
    of each host's pages are crawled-but-unlisted), with
    ``<lastmod>2026-07-{k % 28 + 1}</lastmod>`` OMITTED when k % 7 == 3
    (extractor must tolerate), plus ``1 + h % 3`` phantom locs
    ``p/{n_docs + h + j*n_hosts}`` (lastmod ``2026-06-{h % 28 + 1}``)
    that no crawl row exists for (listed-but-missing).  Entries whose
    k % 5 == 0 carry whitespace padding inside ``<loc>``; the XML has a
    namespace attr and comments a correct extractor must skip.  All
    arithmetic, so a DuckDB oracle restates the extraction exactly.
    Output: (host_id, url, html binary)."""
    hosts = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    urls: list[str] = []
    pages: list[bytes] = []
    for h in hosts.tolist():
        parts = [
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"<!-- sitemap for host{h} -->"
        ]
        for k in range(h, n_docs, n_hosts):
            if k % 3 == 2:
                continue
            loc = f"https://host{h}.example/p/{k}"
            if k % 5 == 0:
                loc = f"\n    {loc}\n  "
            lastmod = (
                "" if k % 7 == 3
                else f"<lastmod>2026-07-{k % 28 + 1:02d}</lastmod>"
            )
            parts.append(f"\n  <url><loc>{loc}</loc>{lastmod}</url>")
        for j in range(1 + h % 3):
            loc = f"https://host{h}.example/p/{n_docs + h + j * n_hosts}"
            parts.append(
                f"\n  <url><loc>{loc}</loc>"
                f"<lastmod>2026-06-{h % 28 + 1:02d}</lastmod></url>"
            )
        parts.append("\n</urlset>\n")
        urls.append(f"https://host{h}.example/sitemap.xml")
        pages.append("".join(parts).encode())
    return pa.table({
        "host_id": batch.column(id_col).cast(pa.int64()),
        "url": pa.array(urls, pa.string()),
        "html": pa.array(pages, pa.binary()),
    })


def synth_robots_bodies(
    batch: "pa.Table",
    *,
    id_col: str = "id",
) -> "pa.Table":
    """Deterministic robots.txt body per host with ARITHMETICALLY
    planted ``Sitemap:`` directives: every host declares
    ``https://host{h}.example/sitemap.xml``; hosts h % 3 == 0 add a
    lowercase ``sitemap:`` pointing at a news feed sitemap (directive
    is case-insensitive); hosts h % 4 == 1 write theirs indented with
    a trailing inline comment.  Decoys a correct extractor must drop:
    a commented-out ``# Sitemap:`` line and a ``NotASitemap:`` field.
    Output: (host_id, body binary)."""
    hosts = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    bodies: list[bytes] = []
    for h in hosts.tolist():
        lines = [
            "# robots for host%d  — crawler policy" % h,
            "User-agent: *",
            f"Disallow: /private{h % 5}/",
            "# Sitemap: https://decoy.example/never.xml",
            f"NotASitemap: https://host{h}.example/fake.xml",
        ]
        if h % 4 == 1:
            lines.append(
                f"  Sitemap:\thttps://host{h}.example/sitemap.xml"
                "  # primary map"
            )
        else:
            lines.append(f"Sitemap: https://host{h}.example/sitemap.xml")
        if h % 3 == 0:
            lines.append(
                f"sitemap: https://host{h}.example/news-sitemap.xml")
        bodies.append("\n".join(lines).encode())
    return pa.table({
        "host_id": batch.column(id_col).cast(pa.int64()),
        "body": pa.array(bodies, pa.binary()),
    })


_SCRIPT_LAT = "abcdefghijklmnopqrstuvwxyz"
_SCRIPT_CYR = "абвгдежзийклмнопрстуфхцчшщ"
_SCRIPT_GRK = "αβγδεζηθικλμνξοπρστυφχψωϊϋ"
_SCRIPT_HAN = "".join(chr(0x4E00 + i) for i in range(26))


def synth_multiscript(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Deterministic multi-script corpus variant: transliterate each
    doc's lowercase a-z by doc_id % 5 — 0 unchanged (latin), 1 →
    Cyrillic, 2 → Greek, 3 → Han, 4 → first half unchanged + second
    half Cyrillic (a planted mixed-script doc, the homoglyph-spam
    shape).  Pure character translation, so DuckDB ``translate()``
    restates it exactly.  Output: (doc_id, text_ms)."""
    maps = {
        1: str.maketrans(_SCRIPT_LAT, _SCRIPT_CYR),
        2: str.maketrans(_SCRIPT_LAT, _SCRIPT_GRK),
        3: str.maketrans(_SCRIPT_LAT, _SCRIPT_HAN),
    }
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    out: list[str] = []
    for i, t in zip(ids.tolist(), texts):
        t = t or ""
        k = i % 5
        if k in maps:
            out.append(t.translate(maps[k]))
        elif k == 4:
            half = len(t) // 2
            out.append(t[:half] + t[half:].translate(maps[1]))
        else:
            out.append(t)
    return pa.table({
        id_col: batch.column(id_col),
        "text_ms": pa.array(out, pa.string()),
    })


def synth_sitemap_forest(
    batch: "pa.Table",
    *,
    n_docs: int,
    n_hosts: int = 20,
    id_col: str = "id",
) -> "pa.Table":
    """Two-level sitemap fixture per host h (driven by
    ``ray.data.range(n_hosts)``): one ``<sitemapindex>`` document at
    ``https://host{h}.example/sitemap.xml`` listing ``1 + h % 3`` child
    locs on CDN hosts (``https://cdn{(h + j) % 2}.example/maps/
    h{h}-part{j}.xml`` — the child's own URL does NOT identify the
    site, forcing a real index join), plus the child ``<urlset>``
    documents: doc k ≡ h (mod n_hosts) goes to child
    ``j = (k // n_hosts) % n_children`` (round-robin).  The union of
    children therefore lists EVERY crawled doc of the host — the
    resolver's oracle is plain doc_id arithmetic.  Output one row per
    document: (host_id, url, html binary); host_id is -1 on child rows
    (their identity is their CDN url, as in a real crawl)."""
    hosts = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    out_host: list[int] = []
    out_url: list[str] = []
    out_html: list[bytes] = []
    for h in hosts.tolist():
        n_children = 1 + h % 3
        child_urls = [
            f"https://cdn{(h + j) % 2}.example/maps/h{h}-part{j}.xml"
            for j in range(n_children)
        ]
        idx = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns='
            '"http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(
                f"\n  <sitemap><loc>{u}</loc></sitemap>"
                for u in child_urls
            )
            + "\n</sitemapindex>\n"
        )
        out_host.append(h)
        out_url.append(f"https://host{h}.example/sitemap.xml")
        out_html.append(idx.encode())
        members: list[list[str]] = [[] for _ in range(n_children)]
        for k in range(h, n_docs, n_hosts):
            j = (k // n_hosts) % n_children
            members[j].append(f"https://host{h}.example/p/{k}")
        for j, locs in enumerate(members):
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns='
                '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                + "".join(f"\n  <url><loc>{u}</loc></url>" for u in locs)
                + "\n</urlset>\n"
            )
            out_host.append(-1)
            out_url.append(child_urls[j])
            out_html.append(body.encode())
    return pa.table({
        "host_id": pa.array(out_host, pa.int64()),
        "url": pa.array(out_url, pa.string()),
        "html": pa.array(out_html, pa.binary()),
    })


def synth_redirect_pages(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    meta_refresh: bool = False,
) -> "pa.Table":
    """Planted identity-resolution fixture: doc i lives at
    ``https://host{i}.example/p`` and redirects to doc i-1 unless
    i % 4 == 0 (the landing page, ≤3 hops).  Landing pages with
    i % 12 != 0 declare ``rel=canonical`` to the DECORATED url of the
    group head (``https://www.host{i - i%12}.example:443/p`` — SURT
    must strip www/port for groups to merge); redirecting (non-landing)
    pages declare a DECOY canonical to ``trap{i}.example`` that a
    correct resolver ignores (a page's declaration is void once it
    redirects).  Resolved identity: cluster = doc_id - doc_id % 12.
    Output: (doc_id, url, html binary, ptr)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    urls: list[str] = []
    pages: list[bytes] = []
    ptrs: list[int] = []
    for i in ids.tolist():
        urls.append(f"https://host{i}.example/p")
        if i % 4 == 0:
            head = i - i % 12
            link = (
                ""
                if i % 12 == 0  # the head itself declares nothing
                else f'<link rel="canonical" '
                     f'href="https://www.host{head}.example:443/p">'
            )
            ptrs.append(i)
        else:
            link = (
                f'<link rel="canonical" '
                f'href="https://trap{i}.example/x">'
            )
            if meta_refresh:
                # the redirect lives in the HTML itself, in rotating
                # attr-order/quote/case shapes the extractor must read
                tgt = f"https://host{i - 1}.example/p"
                if i % 3 == 0:
                    link += (
                        f'<meta content="0; url = {tgt}" '
                        f"HTTP-EQUIV='Refresh'>"
                    )
                elif i % 3 == 1:
                    link += (
                        f'<meta http-equiv=refresh '
                        f"content='{i % 7}6;url={tgt}'>"
                    )
                else:
                    link += (
                        f'<META HTTP-EQUIV="REFRESH" '
                        f'CONTENT="0;URL={tgt}">'
                    )
            ptrs.append(i - 1)
        pages.append(
            f"<html><head>{link}</head><body>p{i}</body></html>".encode())
    return pa.table({
        id_col: batch.column(id_col),
        "url": pa.array(urls, pa.string()),
        "html": pa.array(pages, pa.binary()),
        "ptr": pa.array(ptrs, pa.int64()),
    })


# C4-cleaner input pages: the (pattern, replacement) chain applied IN
# ORDER to documents.text, restated verbatim by the SQL oracle as nested
# regexp_replace(..., 'g'). Both sides run RE2, so global non-overlapping
# replacement semantics agree by construction. The injected markers plant
# every C4 rule: '.'/'?'-terminated line breaks, an unterminated break
# (' sort '), a poisoned-line word ('javascript'), and the two page-level
# kill phrases ('lorem ipsum', '{').
C4_PAGE_REWRITES: tuple[tuple[str, str], ...] = (
    (" big slow ", " lorem ipsum "),
    (" small hash ", " a { b "),
    (" vector ", " javascript "),
    (" merge ", ".\nmerge "),
    (" window ", "?\nwindow "),
    (" sort ", "\nsort "),
)


def synth_c4_pages(
    batch: "pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Deterministic multi-line page text per document for the C4
    line-cleaner: chained Arrow RE2 global replaces (C4_PAGE_REWRITES).
    Output: (id, page_text)."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch.column(text_col), "")
    for pat, repl in C4_PAGE_REWRITES:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return pa.table({id_col: batch.column(id_col), "page_text": col})
