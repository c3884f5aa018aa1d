import pyarrow as pa

from radiant_portal_pipeline_ray.functions.hashing import (
    assign_parts,
    extract_domain,
    hash_strings_to_parts,
    sha256_hex_array,
    stable_hash64,
)


def test_extract_domain():
    urls = pa.array(
        [
            "https://a.example.org/p/1",
            "http://b.example.org/x?q=1",
            "not-a-url",
            None,
        ]
    )
    out = extract_domain(urls).to_pylist()
    assert out == ["a.example.org", "b.example.org", "not-a-url", None]


def test_stable_hash_is_process_independent():
    # sha256("a.example.org")[:8] — fixed forever
    assert stable_hash64("a.example.org") == stable_hash64(b"a.example.org")
    assert stable_hash64("x") != stable_hash64("y")


def test_sha256_hex_array():
    out = sha256_hex_array(pa.array(["abc", None])).to_pylist()
    assert out[0] == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    assert out[1] is None


def test_parts_in_range_and_stable():
    doms = pa.array([f"d{i}.org" for i in range(100)])
    p1 = hash_strings_to_parts(doms, 8).to_pylist()
    p2 = hash_strings_to_parts(doms, 8).to_pylist()
    assert p1 == p2
    assert all(0 <= p < 8 for p in p1)


def test_salted_assignment_stable_and_spread():
    urls = pa.array([f"https://hot.org/p/{i}" for i in range(500)])
    doms = extract_domain(urls)
    salt = {"hot.org": [3, 8, 9]}
    a = assign_parts(urls, doms, 8, salt).to_pylist()
    b = assign_parts(urls, doms, 8, salt).to_pylist()
    assert a == b
    assert set(a) == {3, 8, 9}
    # unsalted domains keep base part
    other = pa.array(["https://cold.org/p/1"])
    got = assign_parts(other, extract_domain(other), 8, salt).to_pylist()[0]
    assert got == stable_hash64("cold.org") % 8
