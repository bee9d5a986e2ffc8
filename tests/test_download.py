"""Exercise the downloader offline (mocked Yandex REST + tar payloads).

The reference's ``lib/download.py`` is unexercisable without egress; here
the REST resolution, streaming download, .part atomic rename, extraction,
already-downloaded skip, and the manual-download error guidance all run
against an in-memory HTTP stub (``/root/reference/lib/download.py:11-46``).
"""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from sgg_tpu.data import download as dl


def _tar_bytes(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, payload in members.items():
            data = payload.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


class _Resp(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_data_exists(tmp_path):
    assert not dl.data_exists(str(tmp_path))
    (tmp_path / "VG" / "VG_100K").mkdir(parents=True)
    (tmp_path / "VG" / "stanford_filtered").mkdir()
    assert dl.data_exists(str(tmp_path))
    assert not dl.data_exists(str(tmp_path), "gqa")
    (tmp_path / "GQA").mkdir()
    (tmp_path / "GQA" / "train_balanced_questions.json").write_text("{}")
    assert dl.data_exists(str(tmp_path), "gqa")


def test_download_resolves_streams_and_extracts(tmp_path, monkeypatch):
    tar = _tar_bytes({"stanford_filtered/VG-SGG-dicts.json": "{}"})
    calls = []

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        if url.startswith(dl._API.split("{")[0]):
            return _Resp(json.dumps({"href": "https://dl/archive"}).encode())
        assert url == "https://dl/archive"
        return _Resp(tar)

    monkeypatch.setattr(dl.urllib.request, "urlopen", fake_urlopen)
    out = dl.download(("https://yadi.sk/d/fake", "VG.tar"), str(tmp_path),
                      chunk=7)  # tiny chunk: exercise the streaming loop
    assert out == str(tmp_path / "VG.tar")
    assert os.path.exists(out) and not os.path.exists(out + ".part")
    assert (tmp_path / "stanford_filtered" / "VG-SGG-dicts.json").exists()
    # the API link was percent-encoded into the resolver URL
    assert "yadi.sk" in calls[0] and calls[0] != "https://yadi.sk/d/fake"


def test_download_skips_existing_archive(tmp_path, monkeypatch):
    (tmp_path / "VG.tar").write_bytes(_tar_bytes({"a.txt": "x"}))

    def no_network(*a, **k):
        raise AssertionError("network touched despite existing archive")

    monkeypatch.setattr(dl.urllib.request, "urlopen", no_network)
    dl.download(("https://yadi.sk/d/fake", "VG.tar"), str(tmp_path))
    assert (tmp_path / "a.txt").read_text() == "x"


def test_download_error_carries_manual_guidance(tmp_path, monkeypatch):
    monkeypatch.setattr(
        dl.urllib.request, "urlopen",
        lambda url, timeout=None: _Resp(
            json.dumps({"error": "quota exceeded"}).encode()))
    with pytest.raises(ValueError, match="manually"):
        dl.download(("https://yadi.sk/d/fake", "VG.tar"), str(tmp_path))
    assert not os.path.exists(tmp_path / "VG.tar")


def test_corrupt_archive_raises_with_hint(tmp_path, monkeypatch, capsys):
    (tmp_path / "VG.tar").write_bytes(b"not a tar at all")
    monkeypatch.setattr(dl.urllib.request, "urlopen",
                        lambda *a, **k: pytest.fail("no network expected"))
    with pytest.raises(Exception):
        dl.download(("https://yadi.sk/d/fake", "VG.tar"), str(tmp_path))
    assert "remove the file and retry" in capsys.readouterr().out


def test_download_all_data_layout(tmp_path, monkeypatch):
    seen = []

    def fake_download(pair, data_dir):
        seen.append((pair[1], os.path.basename(data_dir)))

    monkeypatch.setattr(dl, "download", fake_download)
    dl.download_all_data(str(tmp_path), gqa=True, vg=True)
    assert ("GQA_scenegraphs.tar", "GQA") in seen
    assert ("VG.tar", "VG") in seen
    dl_seen = len(seen)
    dl.download_all_data(str(tmp_path), gqa=False, vg=True)
    assert len(seen) == dl_seen + 1
