import pyarrow as pa

from radiant_portal_pipeline_ray.functions.text import extract_text, extract_text_str


def test_strips_tags_scripts_styles_comments():
    html = (
        b"<html><head><title>T</title><style>p{}</style></head>"
        b"<body><h1>Hi</h1><p>one  two</p><!-- nope -->"
        b"<script>var x=1;</script></body></html>"
    )
    assert extract_text_str(html) == "T Hi one two"


def test_entities_unescaped_single_pass():
    assert extract_text_str(b"<p>fish &amp; chips &lt;b&gt; &amp;lt;</p>") == (
        "fish & chips <b> &lt;"
    )


def test_null_html_gives_null_text():
    out = extract_text(pa.array([None, b"<p>x</p>"], type=pa.binary()))
    assert out[0].as_py() is None
    assert out[1].as_py() == "x"


def test_deterministic_bytes():
    html = b"<html><body><p>a&nbsp;b \n\t c</p></body></html>"
    a = extract_text_str(html)
    b = extract_text_str(html)
    assert a == b == "a b c"


def test_chunked_and_large_batch():
    arr = pa.chunked_array(
        [pa.array([b"<p>a</p>"] * 10, type=pa.binary())] * 3
    )
    out = extract_text(arr)
    assert len(out) == 30
    flat = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
    assert set(flat.to_pylist()) == {"a"}


def test_struct_pass_engines():
    """The polars fast path of the structural strip must be byte-identical
    to the pyarrow/RE2 reference on adversarial html shapes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from radiant_portal_pipeline_ray.functions import text as T

    cases = pa.array(
        [
            "<html><body><p>plain</p></body></html>",
            "<script>var a = '<p>not text</p>';</script>visible",
            "<SCRIPT a=b>x</ScRiPt>after",
            "<style media='x'>.c{color:red}</style>styled",
            "<!-- a <script>inside comment</script> -->kept",
            "a < b not a tag end > c",   # lone angle brackets
            "<p\nmultiline\nattr='v'>body</p>",
            "nested &amp;lt; entity",
            "unclosed <script>never ends...",
            "",
            None,
            "<!--unterminated comment",
        ],
        type=pa.string(),
    )
    ref = pc.replace_substring_regex(cases, pattern=T._STRUCT_RE, replacement=" ")
    got = T._strip_structural(cases)
    assert ref.equals(got if isinstance(got, pa.Array) else got.combine_chunks())
