"""Live-dashboard (visdom replacement) tests: file artifact + HTTP serving.

Reference panels being replaced: loss curves / config / status / mAP
(``/root/reference/tools/visualize.py:408-553``), switch + port parity with
``CTRL.USE_VISDOM`` / ``CTRL.VIS.PORT`` (``lib/config.py:332-351``).
"""

import json
import os
import urllib.request

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.utils import monitor


def test_write_dashboard_artifacts(tmp_path):
    cfg = build_config(debug=True)
    path = monitor.write_dashboard(str(tmp_path), config=cfg)
    assert os.path.exists(path)
    html = open(path).read()
    # the four visdom panels' data hooks must be baked into the page
    for key in ("metrics.jsonl", "config.json", "total_loss", "AP50"):
        assert key in html
    with open(tmp_path / "config.json") as f:
        dump = json.load(f)
    assert dump["TRAIN"]["BATCH_SIZE"] == cfg.TRAIN.BATCH_SIZE


def test_serve_and_port_conflict_degrades(tmp_path):
    (tmp_path / "dashboard.html").write_text("<html>ok</html>")
    srv = monitor.serve(str(tmp_path), port=0)  # free port
    try:
        host, port = srv.server_address[:2]
        assert host == "127.0.0.1"  # loopback only: run folder stays private
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/dashboard.html", timeout=5).read()
        assert b"ok" in body

        # second Trainer / parallel run on the SAME port must not raise —
        # maybe_serve degrades to the file-only dashboard
        cfg = build_config(debug=True)
        cfg.MISC.USE_VISDOM = True
        cfg.MISC.VIS.PORT = port
        assert monitor.maybe_serve(cfg, str(tmp_path)) is None

        import socket
        with socket.socket() as s:  # a (momentarily) free port
            s.bind(("127.0.0.1", 0))
            free_port = s.getsockname()[1]
        cfg.MISC.VIS.PORT = free_port
        srv2 = monitor.maybe_serve(cfg, str(tmp_path))
        assert srv2 is not None
        srv2.shutdown()

        cfg.MISC.USE_VISDOM = False
        assert monitor.maybe_serve(cfg, str(tmp_path)) is None
    finally:
        srv.shutdown()
