"""PyQt5 interactive VOS tool (reference: interactive_gui.py).

A thin event-routing layer over mivos_tpu.interactive.gui_session.
All interaction/overlay/undo/propagation logic lives in GuiSession and
is covered by headless tests; this file is only widgets.

  python interactive_gui.py --video example.mp4 --num_objects 2 \
      --prop_model saves/propagation_model.pth \
      --fusion_model saves/fusion.pth --s2m_model saves/s2m.pth \
      --fbrs_model saves/fbrs.pth
"""
import argparse
import functools
import sys


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--prop_model", default="saves/propagation_model.pth")
    p.add_argument("--fusion_model", default="saves/fusion.pth")
    p.add_argument("--s2m_model", default="saves/s2m.pth")
    p.add_argument("--fbrs_model", default="saves/fbrs.pth")
    p.add_argument("--images", help="folder of frames")
    p.add_argument("--video", help="video file")
    p.add_argument("--masks", help="optional folder of initial masks")
    p.add_argument("--num_objects", type=int, default=1)
    p.add_argument("--mem_freq", type=int, default=5)
    p.add_argument("--mem_profile", type=int, default=0)
    p.add_argument("--resolution", type=int, default=480)
    p.add_argument("--dtype", default="bfloat16")
    return p.parse_args()


def build_session(args):
    from mivos_tpu.checkpoint import (convert_fusion_net,
                                      convert_prop_net, convert_s2m,
                                      load_torch_state_dict)
    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.interactive.fbrs_controller import FBRSController
    from mivos_tpu.interactive.gui_session import GuiSession
    from mivos_tpu.interactive.s2m_controller import S2MController
    from mivos_tpu.interactive.video_io import load_images, load_video
    from mivos_tpu.models import build_fbrs_from_state_dict
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.models.s2m import S2MNetwork

    dtype = None if args.dtype == "float32" else args.dtype
    if args.video:
        frames = load_video(args.video, min_side=args.resolution)
    elif args.images:
        frames = load_images(args.images, min_side=args.resolution)
    else:
        raise SystemExit("provide --video or --images")
    images = frames  # raw uint8; InferenceCore normalizes on device

    prop_net = PropagationNetwork(dtype=dtype)
    prop_params = convert_prop_net(load_torch_state_dict(args.prop_model))
    fuse_net = FusionNet(dtype=dtype)
    fuse_params = convert_fusion_net(load_torch_state_dict(args.fusion_model))
    s2m = S2MNetwork(dtype=dtype)
    s2m_params = convert_s2m(load_torch_state_dict(args.s2m_model))
    # Auto-detect DeepLab vs HRNet from the checkpoint shapes
    # (reference fbrs/inference/utils.py:21-100).
    fbrs, fbrs_params = build_fbrs_from_state_dict(
        load_torch_state_dict(args.fbrs_model))

    s2m_ctrl = S2MController(s2m, s2m_params, args.num_objects)
    fbrs_ctrl = FBRSController(fbrs, fbrs_params)
    session = GuiSession(
        prop_net, prop_params, fuse_net, fuse_params, s2m_ctrl, fbrs_ctrl,
        images, args.num_objects,
        mem=MemoryConfig(mem_freq=args.mem_freq,
                         mem_profile=args.mem_profile))

    if args.masks:
        # Preload existing annotation masks (reference
        # interactive_gui.py --masks / load_masks).
        import numpy as np

        from mivos_tpu.interactive.video_io import load_masks

        labs = load_masks(args.masks)
        for ti in range(min(len(labs), session.t)):
            if labs[ti].max() == 0:
                continue
            oh = np.stack([(labs[ti] == i)
                           for i in range(args.num_objects + 1)]
                          ).astype(np.float32)[..., None]
            session.processor.update_mask_only(oh, ti)
    return session, frames


def main():
    args = parse_args()
    try:
        from PyQt5.QtCore import Qt, QTimer
        from PyQt5.QtGui import QImage, QPixmap
        from PyQt5.QtWidgets import (QApplication, QButtonGroup, QComboBox,
                                     QHBoxLayout, QLabel, QPlainTextEdit,
                                     QPushButton, QRadioButton, QSlider,
                                     QVBoxLayout, QWidget)
    except ImportError:
        raise SystemExit(
            "PyQt5 is required for the GUI. The headless API "
            "(mivos_tpu.interactive.gui_session.GuiSession) provides the "
            "same functionality programmatically.")

    session, frames = build_session(args)

    class App(QWidget):
        def __init__(self):
            super().__init__()
            self.session = session
            self.setWindowTitle("MiVOS-TPU")
            self.mode = "free"
            self.pressed = False
            self.right_click = False

            self.main_canvas = QLabel()
            self.main_canvas.setMouseTracking(True)
            self.main_canvas.mousePressEvent = self.on_press
            self.main_canvas.mouseMoveEvent = self.on_motion
            self.main_canvas.mouseReleaseEvent = self.on_release

            self.tl_slider = QSlider(Qt.Horizontal)
            self.tl_slider.setMaximum(session.t - 1)
            self.tl_slider.valueChanged.connect(self.tl_slide)
            self.brush_slider = QSlider(Qt.Horizontal)
            self.brush_slider.setMinimum(1)
            self.brush_slider.setMaximum(100)
            self.brush_slider.setValue(3)
            self.brush_slider.valueChanged.connect(self.brush_slide)

            self.play_button = QPushButton("Play")
            self.play_button.clicked.connect(self.on_play)
            self.run_button = QPushButton("Propagate")
            self.run_button.clicked.connect(self.on_run)
            self.undo_button = QPushButton("Undo")
            self.undo_button.clicked.connect(self.on_undo)
            self.save_button = QPushButton("Save")
            self.save_button.clicked.connect(self.on_save)

            # Minimap + zoom pane (reference :150-160, :222-229).
            self.minimap = QLabel()
            self.minimap.setMinimumSize(100, 100)
            self.minimap.setAlignment(Qt.AlignTop)
            self.zoom_p_button = QPushButton("Zoom +")
            self.zoom_p_button.clicked.connect(self.on_zoom_plus)
            self.zoom_m_button = QPushButton("Zoom -")
            self.zoom_m_button.clicked.connect(self.on_zoom_minus)
            self.finish_local_button = QPushButton("Finish Local")
            self.finish_local_button.clicked.connect(self.on_finish_local)
            self.finish_local_button.setEnabled(False)

            self.radio_group = QButtonGroup(self)
            radios = QHBoxLayout()
            for name in ["Click", "Scribble", "Free"]:
                r = QRadioButton(name)
                self.radio_group.addButton(r)
                radios.addWidget(r)
                r.toggled.connect(functools.partial(self.set_mode,
                                                    name.lower()))
                if name == "Free":
                    r.setChecked(True)

            self.combo = QComboBox()
            self.combo.addItems(["davis", "fade", "light"])
            self.combo.currentTextChanged.connect(self.set_viz)

            self.console = QPlainTextEdit()
            self.console.setReadOnly(True)

            layout = QVBoxLayout()
            layout.addWidget(self.main_canvas)
            layout.addWidget(self.tl_slider)
            row = QHBoxLayout()
            for w in [self.play_button, self.run_button, self.undo_button,
                      self.save_button, self.combo]:
                row.addWidget(w)
            layout.addLayout(row)
            layout.addLayout(radios)
            layout.addWidget(QLabel("Brush size"))
            layout.addWidget(self.brush_slider)
            layout.addWidget(self.console)

            minimap_area = QVBoxLayout()
            minimap_area.setAlignment(Qt.AlignTop)
            minimap_area.addWidget(QLabel("Minimap"))
            minimap_ctrl = QHBoxLayout()
            minimap_ctrl.addWidget(self.zoom_p_button)
            minimap_ctrl.addWidget(self.zoom_m_button)
            minimap_ctrl.addWidget(self.finish_local_button)
            minimap_area.addLayout(minimap_ctrl)
            minimap_area.addWidget(self.minimap)
            minimap_area.addWidget(QLabel(
                "Ctrl+drag selects a local control region."))

            outer = QHBoxLayout()
            outer.addLayout(layout, 3)
            outer.addLayout(minimap_area, 1)
            self.setLayout(outer)

            self.local_anchor = None  # ctrl-drag region select

            self.play_timer = QTimer(self)
            self.play_timer.timeout.connect(self.next_frame)
            self.refresh()

        # --- helpers ---
        def log(self, text):
            self.console.appendPlainText(
                f"{self.session.status_prefix()} {text}")

        def _to_pixmap(self, rgb):
            rgb = rgb.copy()  # QImage needs contiguous, owned memory
            h, w, _ = rgb.shape
            img = QImage(rgb.data, w, h, 3 * w, QImage.Format_RGB888)
            return QPixmap.fromImage(img)

        def refresh(self):
            if self.session.in_local_mode:
                rgb = self.session.compose_local_frame()
            else:
                rgb = self.session.compose_frame(
                    frames[self.session.cursur].astype("float32") / 255.0)
            self._last_viz = rgb
            self.main_canvas.setPixmap(self._to_pixmap(rgb))
            self.update_minimap()

        def update_minimap(self):
            patch = self.session.minimap_patch(
                None if self.session.in_local_mode else self._last_viz)
            pix = self._to_pixmap(patch)
            self.minimap.setPixmap(pix.scaled(
                self.minimap.size(), Qt.KeepAspectRatio,
                Qt.FastTransformation))

        def canvas_pos(self, event):
            return event.x(), event.y()

        # --- slots ---
        def set_mode(self, mode, checked):
            if checked:
                self.mode = mode

        def set_viz(self, mode):
            self.session.viz_mode = mode
            self.refresh()

        def tl_slide(self, value):
            self.session.goto(value)
            self.refresh()

        def brush_slide(self, value):
            self.session.brush_size = value

        def next_frame(self):
            nxt = (self.session.cursur + 1) % self.session.t
            self.tl_slider.setValue(nxt)

        def on_play(self):
            if self.play_timer.isActive():
                self.play_timer.stop()
            else:
                self.play_timer.start(1000 // 25)

        def on_run(self):
            self.log("Propagation started.")
            masks = self.session.run_propagation(
                step_cb=QApplication.processEvents)
            del masks
            self.refresh()
            self.log("Propagation done.")

        def on_undo(self):
            if self.session.undo():
                self.refresh()
                self.log("Undone.")

        def on_zoom_plus(self):
            self.session.zoom_in()
            self.update_minimap()

        def on_zoom_minus(self):
            self.session.zoom_out()
            self.update_minimap()

        def on_finish_local(self):
            if self.session.in_local_mode:
                self.session.finish_local()
                self.finish_local_button.setEnabled(False)
                self.refresh()
                self.log("Local region stitched back.")

        def on_save(self):
            self.session.save_masks("masks_out")
            self.session.save_overlays("overlays_out")
            self.log("Saved to masks_out/ + overlays_out/.")

        def keyPressEvent(self, event):
            from PyQt5.QtCore import Qt

            # Arrow keys step the timeline (reference
            # interactive_gui.py:304-305).
            if event.key() == Qt.Key_Left:
                self.tl_slider.setValue(max(0, self.session.cursur - 1))
                return
            if event.key() == Qt.Key_Right:
                self.tl_slider.setValue(
                    min(self.session.t - 1, self.session.cursur + 1))
                return
            key = event.text()
            if key.isdigit() and int(key) > 0 and \
                    int(key) <= self.session.num_objects:
                self.session.set_object(int(key))
                self.log(f"Current object: {key}")

        # --- canvas events ---
        def on_press(self, event):
            x, y = self.canvas_pos(event)
            if event.modifiers() & Qt.ControlModifier and \
                    not self.session.in_local_mode:
                self.local_anchor = (x, y)  # ctrl-drag region select
                return
            self.pressed = True
            self.right_click = event.button() != Qt.LeftButton
            self.session.start_interaction(self.mode)
            if self.mode == "click":
                self.session.push_point(x, y, self.right_click)
                self.session.predict()
                self.refresh()
            else:
                obj = 0 if self.right_click else self.session.current_object
                self.session.push_point(x, y, obj)

        def on_motion(self, event):
            x, y = self.canvas_pos(event)
            self.session.set_cursor_pos(x, y)
            if not self.session.in_local_mode:
                self.update_minimap()
            if not self.pressed or self.mode == "click":
                return
            obj = 0 if self.right_click else self.session.current_object
            self.session.push_point(x, y, obj)

        def on_release(self, event):
            if self.local_anchor is not None:
                ax, ay = self.local_anchor
                self.local_anchor = None
                x, y = self.canvas_pos(event)
                lx, ux = sorted((int(ax), int(x)))
                ly, uy = sorted((int(ay), int(y)))
                lx = max(0, lx); ly = max(0, ly)
                ux = min(self.session.width - 1, ux)
                uy = min(self.session.height - 1, uy)
                if ux - lx > 8 and uy - ly > 8:
                    self.session.enter_local((lx, ux, ly, uy))
                    self.finish_local_button.setEnabled(True)
                    self.refresh()
                    self.log("Entered local control mode.")
                return
            if not self.pressed:
                return
            self.pressed = False
            if self.mode != "click":
                x, y = self.canvas_pos(event)
                obj = 0 if self.right_click else self.session.current_object
                self.session.push_point(x, y, obj)
                self.session.end_path()
            self.session.predict()
            self.refresh()

    app = QApplication(sys.argv)
    w = App()
    w.show()
    sys.exit(app.exec_())


if __name__ == "__main__":
    main()
