"""Headless GUI session: interaction hierarchy, undo stacks, local
control, overlay composition (reference interactive_gui.py behaviors,
minus widgets)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.config import MemoryConfig
from mivos_tpu.interactive.gui_session import GuiSession
from mivos_tpu.interactive.interaction import (CropperInteraction,
                                               FreeInteraction,
                                               LocalInteraction)
from mivos_tpu.interactive.s2m_controller import S2MController
from mivos_tpu.models.fusion import FusionNet
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.models.s2m import S2MNetwork

T, H, W, K = 4, 48, 64, 2


@pytest.fixture(scope="module")
def session():
    rng = np.random.RandomState(0)
    prop = PropagationNetwork(top_k=10)
    f0 = jnp.zeros((H, W, 3))
    pp = prop.init(jax.random.PRNGKey(0), f0, jnp.zeros((K, H, W, 1)), f0)
    fuse = FusionNet()
    fp = fuse.init(jax.random.PRNGKey(1), jnp.zeros((K, H, W, 3)),
                   jnp.zeros((K, H, W, 1)), jnp.zeros((K, H, W, 1)),
                   jnp.zeros((K, H, W, 2)), jnp.zeros((K, 2)))
    s2m = S2MNetwork()
    sp = s2m.init(jax.random.PRNGKey(2), jnp.zeros((K, H, W, 6)))
    s2m_ctrl = S2MController(s2m, sp, K)
    images = rng.rand(T, H, W, 3).astype(np.float32)
    return GuiSession(prop, pp, fuse, fp, s2m_ctrl, None, images, K,
                      mem=MemoryConfig(top_k=10))


class TestFreeInteraction:
    def test_paint_predict_undo(self, session):
        session.goto(0)
        it = session.start_interaction("free")
        assert isinstance(it, FreeInteraction)
        session.push_point(5, 5, 1)
        session.push_point(30, 30, 1)
        session.end_path()
        mask = session.predict()
        assert mask.shape == (H, W)
        assert (mask == 1).any()  # painted stroke became object 1
        # erase with object 0
        session.push_point(5, 5, 0)
        session.push_point(30, 30, 0)
        session.end_path()
        erased = session.predict()
        assert (erased == 1).sum() < (mask == 1).sum() + 1
        # undo restores the painted map
        assert session.undo()
        restored = session.current_mask()
        np.testing.assert_array_equal(restored, mask)

    def test_brush_size_respected(self, session):
        session.goto(1)
        session.brush_size = 11
        session.start_interaction("free")
        session.push_point(10, 24, 1)
        session.push_point(50, 24, 1)
        session.end_path()
        mask = session.predict()
        rows = np.where((mask == 1).any(axis=1))[0]
        assert len(rows) >= 11  # at least brush-width rows painted


class TestScribbleInteraction:
    def test_s2m_scribble_produces_distribution(self, session):
        session.goto(2)
        session.start_interaction("scribble")
        session.push_point(8, 8, 1)
        session.push_point(40, 30, 1)
        session.end_path()
        mask = session.predict()
        assert mask.shape == (H, W)
        assert set(np.unique(mask)) <= {0, 1, 2}


class TestLocalControl:
    def test_crop_stitch_roundtrip(self, session):
        session.goto(3)
        # paint object 1 globally first
        session.start_interaction("free")
        session.push_point(5, 5, 1)
        session.push_point(20, 20, 1)
        session.end_path()
        before = session.predict().copy()

        session.enter_local((16, 47, 8, 39))  # lx, ux, ly, uy
        assert session.in_local_mode
        it = session.start_interaction("free")
        assert isinstance(it, FreeInteraction)
        # paint object 2 inside the local region (local coords)
        session.push_point(4, 10, 2)
        session.push_point(25, 25, 2)
        session.end_path()
        session.predict()
        after = session.finish_local()
        assert not session.in_local_mode
        assert (after == 2).any()
        # pixels far outside the box are untouched
        outside = (slice(0, 7), slice(0, 14))
        np.testing.assert_array_equal(after[outside], before[outside])


class TestSessionMisc:
    def test_compose_frame_modes(self, session):
        session.goto(0)
        for mode in ["davis", "fade", "light"]:
            session.viz_mode = mode
            rgb = session.compose_frame()
            assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8

    def test_object_hotkey_bounds(self, session):
        session.set_object(2)
        assert session.current_object == 2
        with pytest.raises(AssertionError):
            session.set_object(K + 1)
        session.set_object(1)

    def test_save_masks(self, session, tmp_path):
        session.save_masks(str(tmp_path / "m"))
        import os
        assert len(os.listdir(tmp_path / "m")) == T

    def test_propagation_after_interaction(self, session):
        session.goto(0)
        session.start_interaction("free")
        session.push_point(5, 5, 1)
        session.push_point(30, 30, 1)
        session.end_path()
        session.predict()
        steps = []
        masks = session.run_propagation(step_cb=lambda: steps.append(1))
        assert masks.shape == (T, H, W)
        assert len(steps) == T - 1
        assert session.interacted_mask is None


class TestClickInteractionInSession:
    def test_click_flow_with_fake_controller(self, session):
        """Click mode routes through the fbrs controller contract:
        interact(image, x, y, positive) -> (nh, nw) object probability;
        undo() -> previous map (reference interaction.py:265-335)."""

        class FakeFBRS:
            def __init__(self):
                self.history = []

            def unanchor(self):
                pass

            def interact(self, image, x, y, positive):
                m = np.zeros((image.shape[0], image.shape[1]), np.float32)
                y0, x0 = int(y), int(x)
                m[max(0, y0 - 5):y0 + 5, max(0, x0 - 5):x0 + 5] = \
                    1.0 if positive else 0.0
                self.history.append(m)
                return m

            def undo(self):
                self.history.pop()
                return self.history[-1] if self.history else None

        session.goto(0)
        session.fbrs_controller = FakeFBRS()
        session.current_object = 1
        it = session.start_interaction("click")
        session.push_point(30, 20, False)  # positive click (neg=False)
        mask = session.predict()
        assert (mask == 1).any()
        # second click then undo returns to the first state
        session.push_point(50, 40, False)
        m2 = session.predict().copy()
        assert session.undo()
        m1 = session.current_mask()
        assert not np.array_equal(m1, m2) or (m1 == m2).all()
        assert it.can_undo() is not None


class TestMinimapZoom:
    """Minimap/zoom pane logic (reference interactive_gui.py
    :150-160, :284, :422-443, :644-652)."""

    def test_zoom_limits_and_steps(self, session):
        session.zoom_pixels = 150
        assert session.zoom_in() == 125           # Zoom + shrinks window
        for _ in range(10):
            session.zoom_in()
        assert session.zoom_pixels == 50          # floor
        for _ in range(20):
            session.zoom_out()
        assert session.zoom_pixels == 300         # ceiling

    def test_zoom_rect_clamped_inside_frame(self, session):
        session.zoom_pixels = 40       # fits the 48 x 64 test frames
        # cursor outside the frame: rect must clamp fully inside
        session.set_cursor_pos(-10, -10)
        y0, y1, x0, x1 = session.zoom_rect()
        assert (y0, x0) == (0, 0) and (y1 - y0, x1 - x0) == (40, 40)
        session.set_cursor_pos(10 ** 4, 10 ** 4)
        y0, y1, x0, x1 = session.zoom_rect()
        assert y1 == session.height and x1 == session.width
        assert (y1 - y0, x1 - x0) == (40, 40)
        # interior cursor: centered window
        session.set_cursor_pos(32, 24)
        y0, y1, x0, x1 = session.zoom_rect()
        assert (y0, y1, x0, x1) == (4, 44, 12, 52)

    def test_minimap_patch_is_zoom_window_of_viz(self, session):
        session.zoom_pixels = 40
        session.set_cursor_pos(40, 20)
        viz = session.compose_frame()
        patch = session.minimap_patch(viz)
        y0, y1, x0, x1 = session.zoom_rect()
        np.testing.assert_array_equal(patch, viz[y0:y1, x0:x1])
        # window larger than the frame: patch covers the whole frame
        session.zoom_pixels = 300
        patch = session.minimap_patch(viz)
        assert patch.shape[0] == session.height
        assert patch.shape[1] == session.width

    def test_minimap_frozen_in_local_mode(self, session):
        session.goto(0)
        session.zoom_pixels = 40
        snapshot_before = session.compose_frame()
        session.enter_local((10, 40, 10, 40))
        try:
            frozen = session.minimap_patch()
            np.testing.assert_array_equal(frozen, snapshot_before)
            # local canvas composes the crop at crop resolution
            local = session.compose_local_frame()
            assert local.shape == (31, 31, 3)
        finally:
            session.finish_local()
        assert session._minimap_local_snapshot is None
        # back to the live zoom window
        live = session.minimap_patch()
        assert live.shape[0] == 40 and live.shape[1] == 40
