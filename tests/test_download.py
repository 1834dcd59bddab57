"""Downloader: listing generation, skip-existing, graceful per-shard
failure (hermetic — network calls are stubbed)."""


from click.testing import CliRunner

from pivp_tpu.data import download


def test_listing_split_filter():
    assert len(download.shard_listing(["push_train"])) == 264
    assert len(download.shard_listing(["push_testseen"])) == 5


def test_download_file_skips_existing(tmp_path, monkeypatch):
    rel = "push/push_train/push_train.tfrecord-00000-of-00264"
    target = tmp_path / rel
    target.parent.mkdir(parents=True)
    target.write_bytes(b"cached")
    calls = []
    monkeypatch.setattr("urllib.request.urlretrieve",
                        lambda url, path: calls.append(url))
    out = download.download_file(rel, str(tmp_path))
    assert out == str(target)
    assert calls == []  # no network touch


def test_cli_continues_past_failures(tmp_path, monkeypatch):
    def boom(url, path):
        raise OSError("no network")

    monkeypatch.setattr("urllib.request.urlretrieve", boom)
    runner = CliRunner()
    result = runner.invoke(download.main, [
        "--out_dir", str(tmp_path), "--split", "push_testseen",
        "--limit", "3"])
    assert result.exit_code == 0  # failures logged, run completes


def test_cli_custom_listing(tmp_path, monkeypatch):
    listing = tmp_path / "list.txt"
    listing.write_text("push/a/one\npush/a/two\n")
    fetched = []
    monkeypatch.setattr(
        download, "download_file",
        lambda rel, out_dir, skip_existing=True: fetched.append(rel))
    runner = CliRunner()
    result = runner.invoke(download.main, [
        "--out_dir", str(tmp_path), "--listing", str(listing)])
    assert result.exit_code == 0
    assert fetched == ["push/a/one", "push/a/two"]
