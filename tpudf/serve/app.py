"""Gradio front-end parity app (optional; gated on gradio availability).

UI equivalent of the reference detector apps (appv3.py:6846-7653): upload an
image or video → label banner, fake probability, risk band, verdict,
forensic heatmap overlay, per-signal table, JSON report, plain-language
explanation.

Run: python -m tpudf.serve.app --artifacts /path/siglip [--share]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_predict_fns(engine):
    import jax.numpy as jnp

    from tpudf.ops.forensic_maps import forensic_map_battery, heatmap_overlay
    from tpudf.serve.explain import explain_report
    from tpudf.serve.report import predict_images, predict_video

    def predict_image(pil_img):
        from PIL import Image
        size = engine.cfg.image_size
        img = pil_img.convert("RGB").resize((size, size), Image.BICUBIC)
        px = np.asarray(img, np.uint8)[None]
        report = predict_images(engine, px)[0]
        x = jnp.asarray(px).astype(jnp.float32) / 255.0
        if size != 256:
            import jax
            x = jax.image.resize(x, (1, 256, 256, 3), "bilinear")
        maps = forensic_map_battery(x)
        overlay = heatmap_overlay(px[0], np.asarray(maps["combined"])[0])
        expl = explain_report(report)
        header = (f"{report['final_label']}  —  "
                  f"P(fake) = {report['final_prob']:.1%}  "
                  f"[{report['band_text']}]")
        return (header, expl["summary"], overlay,
                json.dumps(report, indent=2, default=float))

    def predict_clip(video_path):
        from tpudf.data.video import sample_video
        frames, idxs = sample_video(video_path, size=engine.cfg.image_size)
        if frames is None:
            return "DECODE FAILED", "", None, "{}"
        rep = predict_video(engine, frames)
        expl = explain_report(rep["chosen_frame_report"])
        header = (f"{rep['video_label']}  —  "
                  f"P(fake) = {rep['video_prob']:.1%}")
        chosen = frames[rep["chosen_frame"]]
        return (header, expl["summary"], chosen,
                json.dumps(rep, indent=2, default=float))

    return predict_image, predict_clip


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifacts", default=None)
    p.add_argument("--model_size", default="base-256")
    p.add_argument("--backbone_ckpt", default=None)
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; "
                         "use `python -m tpudf.cli.infer` for batch "
                         "inference instead")

    from tpudf.cli.infer import build_engine
    engine = build_engine(args)
    predict_image, predict_clip = build_predict_fns(engine)

    with gr.Blocks(title="tpudf deepfake detector") as demo:
        gr.Markdown("# tpudf — TPU-native deepfake detection")
        with gr.Tab("Image"):
            inp = gr.Image(type="pil")
            btn = gr.Button("Analyze")
            header = gr.Textbox(label="Result")
            summary = gr.Textbox(label="Explanation")
            overlay = gr.Image(label="Anomaly heatmap")
            report = gr.Code(label="JSON report", language="json")
            btn.click(predict_image, inp, [header, summary, overlay, report])
        with gr.Tab("Video"):
            vin = gr.Video()
            vbtn = gr.Button("Analyze video")
            vheader = gr.Textbox(label="Result")
            vsummary = gr.Textbox(label="Explanation")
            vframe = gr.Image(label="Key frame")
            vreport = gr.Code(label="JSON report", language="json")
            vbtn.click(predict_clip, vin,
                       [vheader, vsummary, vframe, vreport])
    demo.launch(share=args.share)


if __name__ == "__main__":
    main()
