"""Explanation tooling: slot heatmaps, area metrics, XAI-baseline attribution.

Attribution suite (capabilities of the vendored torchcam/torchray/IBA/IGOS and
the captum usage):

- cam:          CAM, Grad-CAM, Grad-CAM++, Smooth Grad-CAM++, Score-CAM,
                SS-CAM, ISS-CAM
- backprop:     gradient, deconvnet, guided backprop, linear approximation
- excitation:   excitation backprop + contrastive variant
- deeplift:     DeepLift (rescale), input- and layer-level
- rise:         RISE masked-forward saliency
- extremal:     extremal perturbation (+ blur/fade pyramids, imsmooth)
- igos:         IGOS integrated-gradient mask optimization + deletion/insertion
- iba:          information bottleneck attribution (Welford stats + analyze)
- pointing_game / benchmark: explanation-accuracy benchmarking + result store
- benchmark_models: caffe VGG16/ResNet50 pointing-game reference models
- vis:          per-slot heatmap rendering, jet overlays, area ratios
- compare_cli:  torchcam_vis/captum_vis-parity side-by-side driver
"""

from .vis import (
    apply_colormap_on_image,
    attention_area_ratio,
    attention_to_maps,
    save_slot_pngs,
)

__all__ = [
    "apply_colormap_on_image",
    "attention_area_ratio",
    "attention_to_maps",
    "save_slot_pngs",
]
