"""Conditional-PUT CAS branches for GCS and Azure (VERDICT r4 #4).

Same method as the s3 fake-fs test (`test_review_r4.py`): a minimal
fsspec-shaped stand-in that models each store's *documented* conditional
semantics — gcsfs forwarding ``if_generation_match=0`` and raising an
HttpError-shaped 412 'conditionNotMet', adlfs honoring
``overwrite=False`` and raising azure-core's ResourceExistsError — with a
race hook landing a competing write between the condition check and the
put, exactly where a distributed race would. The genuinely-unknown
protocol refusal stays.
"""

import pytest

from radiant_portal_pipeline_ray.state.manifest import Lake

FINAL = "bucket/lake/manifests/manifest-v000000000001.json"


class _HttpError(Exception):
    """gcsfs.retry.HttpError shape: NOT an OSError subclass."""


class _FakeGCSFS:
    protocol = "gs"

    def __init__(self):
        self.store: dict[str, bytes] = {}
        self.race_hook = None
        self.saw_condition = False

    def pipe_file(self, path, data, **kw):
        if kw.get("if_generation_match") == 0:
            self.saw_condition = True
            if path in self.store:
                raise _HttpError("conditionNotMet, 412")
            if self.race_hook:
                self.race_hook()
                if path in self.store:  # GCS evaluates atomically; model it
                    raise _HttpError("conditionNotMet, 412")
        self.store[path] = bytes(data)


class ResourceExistsError(Exception):
    """azure.core.exceptions.ResourceExistsError shape (matched by NAME)."""


class _FakeAzureFS:
    protocol = "abfs"

    def __init__(self):
        self.store: dict[str, bytes] = {}
        self.race_hook = None
        self.saw_condition = False

    def pipe_file(self, path, data, **kw):
        if kw.get("overwrite") is False:
            self.saw_condition = True
            if path in self.store:
                raise ResourceExistsError("BlobAlreadyExists")
            if self.race_hook:
                self.race_hook()
                if path in self.store:
                    raise ResourceExistsError("BlobAlreadyExists")
        self.store[path] = bytes(data)


def _lake_with(fs):
    lake = Lake.__new__(Lake)
    lake.filesystem = fs
    return lake


@pytest.mark.parametrize("fs_cls", [_FakeGCSFS, _FakeAzureFS])
def test_conditional_put_winner_loser(fs_cls):
    fs = fs_cls()
    lake = _lake_with(fs)
    assert lake._put_manifest_if_absent(FINAL, b"A", "ta") is True
    assert fs.saw_condition, "CAS must send the backend's creation condition"
    assert lake._put_manifest_if_absent(FINAL, b"B", "tb") is False
    assert fs.store[FINAL] == b"A", "loser must never clobber the winner"


@pytest.mark.parametrize("fs_cls", [_FakeGCSFS, _FakeAzureFS])
def test_conditional_put_interleaved_race(fs_cls):
    """B lands between A's condition check and A's put: the store's atomic
    precondition rejects A, and A's CAS reports a clean loss."""
    fs = fs_cls()
    lake = _lake_with(fs)

    def sneak():
        fs.store[FINAL] = b"B-won"

    fs.race_hook = sneak
    assert lake._put_manifest_if_absent(FINAL, b"A", "ta") is False
    assert fs.store[FINAL] == b"B-won"


def test_non_precondition_errors_propagate():
    """Only a lost CAS maps to False; real faults must raise."""

    class _BrokenGCS(_FakeGCSFS):
        def pipe_file(self, path, data, **kw):
            raise _HttpError("503 backend unavailable")

    lake = _lake_with(_BrokenGCS())
    with pytest.raises(_HttpError):
        lake._put_manifest_if_absent(FINAL, b"A", "ta")


def test_unknown_protocol_still_refuses():
    class _MysteryFS:
        protocol = "ipfs"

        def pipe_file(self, path, data, **kw):
            pass

    lake = _lake_with(_MysteryFS())
    with pytest.raises(NotImplementedError):
        lake._put_manifest_if_absent(FINAL, b"A", "ta")
