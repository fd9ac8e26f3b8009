"""Demo CLI smoke: output-file parity with the reference demo
(ref demo.py:97-145 writes {base}_{pid}.png, {base}_{pid}.obj, {base}_all.png)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    cv2.imwrite(str(d / "scene.png"), img)
    return d


class TestDemoOutputs:
    def test_output_files_match_reference_layout(self, img_dir, tmp_path):
        from cli.demo import main
        out = tmp_path / "out"
        main(["--img-folder", str(img_dir), "--out-folder", str(out),
              "--tiny", "--platform", "cpu", "--detector", "full_frame",
              "--side-view", "--save-mesh"])
        files = sorted(os.listdir(out))
        assert "scene_all.png" in files       # full-frame composite
        assert "scene_0.png" in files         # per-person crop panel
        assert "scene_0.obj" in files         # exported mesh
        # panel = input | render | side -> 3x crop width
        import cv2
        panel = cv2.imread(str(out / "scene_0.png"))
        assert panel is not None and panel.shape[1] == 3 * panel.shape[0]

    def test_quant_int8_with_calibration(self, img_dir, tmp_path):
        """--quant int8 runs the one-shot calibration (static scales +
        pre-quantized weights in params['backbone_quant']) end-to-end."""
        from cli.demo import main
        out = tmp_path / "out_q"
        main(["--img-folder", str(img_dir), "--out-folder", str(out),
              "--tiny", "--platform", "cpu", "--detector", "full_frame",
              "--quant", "int8"])
        assert "scene_all.png" in os.listdir(out)

    def test_device_preproc_with_quant(self, img_dir, tmp_path):
        """--device-preproc + --quant int8: the first frame's host-warped
        crops calibrate, and the updated params reach the serving pipeline
        (pipeline.params is swapped after calibration)."""
        from cli.demo import main
        out = tmp_path / "out_dp"
        main(["--img-folder", str(img_dir), "--out-folder", str(out),
              "--tiny", "--platform", "cpu", "--detector", "full_frame",
              "--device-preproc", "--quant", "int8"])
        assert "scene_all.png" in os.listdir(out)
