

def test_embedded_id2label_for_1000_classes(tmp_path):
    """With a 1000-class folder tree and no external JSON, the dataset uses
    the embedded canonical mapping (reference imagenet.py:157+)."""
    from mmlearn_tpu.datasets.builtin.imagenet import ImageNet

    (tmp_path / "train").mkdir()
    for i in range(1000):
        d = tmp_path / "train" / f"n{i:08d}"
        d.mkdir()
        if i == 0:  # at least one image so the dataset is non-empty
            import numpy as np
            from PIL import Image

            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8)
            ).save(d / "img0.jpeg")
    ds = ImageNet(root_dir=str(tmp_path), split="train", transform=None)
    assert ds.id2label[0] == "tench"
    assert ds.id2label[999] == "toilet paper"
    assert len(ds.id2label) == 1000
