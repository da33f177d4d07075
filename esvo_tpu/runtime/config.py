"""System configuration: one dataclass tree replacing the reference's ROS
parameter server + per-node YAMLs (cfg/mapping/*.yaml, cfg/tracking/*.yaml,
cfg/time_surface/ts_parameters.yaml) and dynamic_reconfigure
(cfg/DVS_MappingStereo.cfg).

`SystemConfig.from_yaml` understands the reference's parameter names so the
shipped dataset configs (e.g. cfg/mapping/mapping_rpg.yaml) translate
directly.
"""
from __future__ import annotations

import dataclasses

from esvo_tpu.surface.time_surface import TimeSurfaceConfig
from esvo_tpu.mapping.block_matching import BlockMatchConfig
from esvo_tpu.mapping.depth_refinement import DepthProblemConfig
from esvo_tpu.mapping.fusion import FusionConfig
from esvo_tpu.mapping.regularization import RegularizationConfig
from esvo_tpu.mapping.initialization import SGMConfig
from esvo_tpu.tracking.registration import RegProblemConfig


@dataclasses.dataclass
class MappingConfig:
    """Node-level mapping knobs (esvo_Mapping.cpp:35-99 defaults ->
    cfg/mapping/mapping_rpg.yaml values)."""
    inv_depth_min_range: float = 0.2
    inv_depth_max_range: float = 2.0
    residual_vis_threshold: float = 20.0
    std_var_vis_threshold: float = 0.015
    age_max_range: int = 10
    age_vis_threshold: int = 1
    fusion_strategy: str = "CONST_POINTS"   # or "CONST_FRAMES"
    max_fusion_frames: int = 40
    max_fusion_points: int = 5000
    denoising: bool = True
    regularization: bool = True
    process_event_num: int = 1000
    # NOTE: the reference's TS_HISTORY_LENGTH (100 surfaces,
    # esvo_Mapping.cpp:756-761) has no equivalent here: the synchronous
    # loop always maps on the surface of the current tick, so no history
    # buffer of surfaces is kept.
    init_sgm_num_threshold: int = 500
    mapping_rate_hz: float = 20.0
    bm_half_slice_thickness: float = 0.001

    @property
    def cost_vis_threshold(self) -> float:
        # set at SystemConfig level (needs patch area)
        raise AttributeError


@dataclasses.dataclass
class TrackingNodeConfig:
    """Node-level tracking knobs (esvo_Tracking.cpp:24-60).

    tracking_rate_hz is the sync-tick rate the node would run at — the
    replay CLI reads it as the default --tick-rate-hz. The low-event
    gate lives on RegProblemConfig.min_num_events (one source of
    truth)."""
    tracking_rate_hz: float = 100.0
    ref_history_length: int = 10
    # velocity-plausibility guard on accepted tracker poses: a solve
    # whose step implies motion faster than this is a diverged
    # registration (a single accepted teleport poisons the pose table
    # and the mapper then rebuilds the map at the wrong pose, cementing
    # the jump). The allowance scales with time since the last ACCEPTED
    # pose, so legitimate catch-up after rejected ticks still passes.
    # Defaults are far above handheld/vehicle motion (30 m/s covers
    # automotive DSEC driving); tighten per sequence (e.g.
    # --set tracking.max_speed_mps=1.0 for slow handheld loops). After
    # max_consecutive_rejects rejections in a row the system re-anchors
    # to the incoming pose: a frozen anchor would otherwise reject every
    # subsequent pose forever once true displacement outruns the
    # allowance.
    max_speed_mps: float = 30.0
    max_ang_speed_rps: float = 10.0
    max_consecutive_rejects: int = 20
    # constant-velocity motion prior for the tracker's initial guess
    # (device-resident loop): extrapolate one accepted step forward
    # instead of starting from the last pose. Helps open-loop runs on
    # fast/noisy streams (r5 campaign raw ATE 1.57 -> 1.07) but is
    # DEFAULT OFF: extrapolating through one accepted outlier drifts
    # the next guess ahead of the map and can run away (measured: the
    # bench's synthetic closed loop diverged at some dispatch sizes,
    # and the campaign's pose-graph configuration scored worse with it).
    # The reference always starts from the last pose.
    constant_velocity_prior: bool = False


@dataclasses.dataclass
class SystemConfig:
    surface: TimeSurfaceConfig = dataclasses.field(
        default_factory=TimeSurfaceConfig)
    bm: BlockMatchConfig = dataclasses.field(default_factory=BlockMatchConfig)
    depth: DepthProblemConfig = dataclasses.field(
        default_factory=DepthProblemConfig)
    fusion: FusionConfig = dataclasses.field(default_factory=FusionConfig)
    regularizer: RegularizationConfig = dataclasses.field(
        default_factory=RegularizationConfig)
    sgm: SGMConfig = dataclasses.field(default_factory=SGMConfig)
    tracker: RegProblemConfig = dataclasses.field(
        default_factory=RegProblemConfig)
    mapping: MappingConfig = dataclasses.field(default_factory=MappingConfig)
    tracking: TrackingNodeConfig = dataclasses.field(
        default_factory=TrackingNodeConfig)

    def __post_init__(self):
        # keep the per-module LSnorm settings coherent
        norm = self.depth.ls_norm
        self.fusion = dataclasses.replace(self.fusion, ls_norm=norm)
        self.regularizer = dataclasses.replace(
            self.regularizer, ls_norm=norm,
            radius=self.depth.regularization_radius,
            min_neighbours=self.depth.regularization_min_neighbours,
            min_close_neighbours=(
                self.depth.regularization_min_close_neighbours))

    @property
    def cost_vis_threshold(self) -> float:
        """pow(residual_vis_threshold, 2) * patch_area
        (esvo_Mapping.cpp:69)."""
        return (self.mapping.residual_vis_threshold ** 2
                * self.depth.patch_area)

    @staticmethod
    def from_dict(d: dict) -> "SystemConfig":
        """Build from a nested dict in the native schema: section names
        are SystemConfig field names, keys inside each section are that
        config dataclass's field names (the shipped per-dataset presets
        under configs/ use this format)."""
        cfg = SystemConfig()
        types = {
            "surface": TimeSurfaceConfig, "bm": BlockMatchConfig,
            "depth": DepthProblemConfig, "fusion": FusionConfig,
            "regularizer": RegularizationConfig, "sgm": SGMConfig,
            "tracker": RegProblemConfig, "mapping": MappingConfig,
            "tracking": TrackingNodeConfig,
        }
        for section, values in d.items():
            if section not in types:
                if section == "dataset":
                    continue
                raise KeyError(f"unknown config section {section!r}; "
                               f"expected one of {sorted(types)}")
            cls = types[section]
            names = {f.name for f in dataclasses.fields(cls)}
            bad = set(values) - names
            if bad:
                raise KeyError(f"unknown keys {sorted(bad)} in config "
                               f"section {section!r}")
            setattr(cfg, section, cls(**values))
        # selective coherence: __post_init__ would clobber explicitly
        # given regularizer/fusion sections with depth-derived values —
        # only derive what the dict did NOT set
        if "regularizer" not in d:
            cfg.regularizer = dataclasses.replace(
                cfg.regularizer, ls_norm=cfg.depth.ls_norm,
                radius=cfg.depth.regularization_radius,
                min_neighbours=cfg.depth.regularization_min_neighbours,
                min_close_neighbours=(
                    cfg.depth.regularization_min_close_neighbours))
        elif "ls_norm" not in d["regularizer"]:
            cfg.regularizer = dataclasses.replace(
                cfg.regularizer, ls_norm=cfg.depth.ls_norm)
        if "fusion" not in d or "ls_norm" not in d["fusion"]:
            cfg.fusion = dataclasses.replace(cfg.fusion,
                                             ls_norm=cfg.depth.ls_norm)
        return cfg

    @staticmethod
    def from_preset(name_or_path: str) -> "SystemConfig":
        """Load a shipped per-dataset preset ("rpg", "upenn", "hkust",
        "dsec", "simulation" — the analogue of the reference's
        cfg/{mapping,tracking}/*.yaml pairs) or any YAML file in the
        native nested schema."""
        import os
        import yaml

        path = name_or_path
        if not os.path.exists(path):
            root = os.path.join(os.path.dirname(__file__), "..", "..",
                                "configs")
            path = os.path.join(root, f"{name_or_path}.yaml")
            if not os.path.exists(path):
                avail = sorted(p[:-5] for p in os.listdir(root)
                               if p.endswith(".yaml"))
                raise FileNotFoundError(
                    f"no preset {name_or_path!r}; available: {avail}")
        with open(path) as f:
            return SystemConfig.from_dict(yaml.safe_load(f))

    @staticmethod
    def from_yaml(mapping_yaml: str | None = None,
                  tracking_yaml: str | None = None,
                  time_surface_yaml: str | None = None) -> "SystemConfig":
        """Build from reference-format YAML files (parameter names as in
        cfg/mapping/*.yaml, cfg/tracking/*.yaml, ts_parameters.yaml)."""
        import yaml

        cfg = SystemConfig()
        if mapping_yaml:
            with open(mapping_yaml) as f:
                m = yaml.safe_load(f)
            # the reference's mapping YAMLs are inconsistent: rpg/hkust
            # name the key "Lnorm", upenn/dsec "LSnorm"
            lnorm = str(m.get("Lnorm", m.get("LSnorm", "Tdist")))
            cfg.depth = DepthProblemConfig(
                patch_size_x=int(m.get("patch_size_X", 15)),
                patch_size_y=int(m.get("patch_size_Y", 7)),
                ls_norm=lnorm,
                td_nu=float(m.get("Tdist_nu", 2.1897)),
                td_scale=float(m.get("Tdist_scale", 16.6397)),
                max_iteration=int(m.get("ITERATION_OPTIMIZATION", 10)),
                regularization_radius=int(m.get("RegularizationRadius", 5)),
                regularization_min_neighbours=int(
                    m.get("RegularizationMinNeighbours", 8)),
                regularization_min_close_neighbours=int(
                    m.get("RegularizationMinCloseNeighbours", 8)))
            cfg.bm = BlockMatchConfig(
                patch_size_x=int(m.get("patch_size_X", 15)),
                patch_size_y=int(m.get("patch_size_Y", 7)),
                min_disparity=int(m.get("BM_min_disparity", 1)),
                max_disparity=int(m.get("BM_max_disparity", 40)),
                step=int(m.get("BM_step", 1)),
                zncc_threshold=float(m.get("BM_ZNCC_Threshold", 0.1)),
                up_down=bool(m.get("BM_bUpDownConfiguration", False)),
                smooth_time_surface=bool(m.get("SmoothTimeSurface", False)))
            cfg.fusion = FusionConfig(
                ls_norm=lnorm,
                fusion_radius=int(m.get("fusion_radius", 0)))
            cfg.mapping = MappingConfig(
                inv_depth_min_range=float(m.get("invDepth_min_range", 0.2)),
                inv_depth_max_range=float(m.get("invDepth_max_range", 2.0)),
                residual_vis_threshold=float(
                    m.get("residual_vis_threshold", 20)),
                std_var_vis_threshold=float(
                    m.get("stdVar_vis_threshold", 0.015)),
                age_max_range=int(m.get("age_max_range", 10)),
                age_vis_threshold=int(m.get("age_vis_threshold", 1)),
                fusion_strategy=str(m.get("FUSION_STRATEGY",
                                          "CONST_POINTS")),
                max_fusion_frames=int(m.get("maxNumFusionFrames", 40)),
                max_fusion_points=int(m.get("maxNumFusionPoints", 5000)),
                denoising=bool(m.get("Denoising", True)),
                regularization=bool(m.get("Regularization", True)),
                process_event_num=int(m.get("PROCESS_EVENT_NUM", 1000)),
                init_sgm_num_threshold=int(
                    m.get("INIT_SGM_DP_NUM_THRESHOLD", 500)),
                mapping_rate_hz=float(m.get("mapping_rate_hz", 20)),
                bm_half_slice_thickness=float(
                    m.get("BM_half_slice_thickness", 0.001)))
        if tracking_yaml:
            with open(tracking_yaml) as f:
                t = yaml.safe_load(f)
            cfg.tracker = RegProblemConfig(
                patch_size_x=int(t.get("patch_size_X", 1)),
                patch_size_y=int(t.get("patch_size_Y", 1)),
                kernel_size=int(t.get("kernelSize", 5)),
                huber_threshold=float(t.get("huber_threshold", 50)),
                max_registration_points=int(
                    t.get("MAX_REGISTRATION_POINTS", 2000)),
                batch_size=int(t.get("BATCH_SIZE", 300)),
                max_iteration=int(t.get("MAX_ITERATION", 10)),
                ls_norm=str(t.get("LSnorm", "Huber")),
                min_num_events=int(t.get("MIN_NUM_EVENTS", 1000)),
                # RegProblemType: 0 numerical, 1 analytical
                # (esvo_Tracking.cpp reads it; RegProblemSolverLM.cpp:76-145)
                use_numerical_diff=int(t.get("RegProblemType", 1)) == 0)
            cfg.tracking = TrackingNodeConfig(
                tracking_rate_hz=float(t.get("tracking_rate_hz", 100)),
                ref_history_length=int(t.get("REF_HISTORY_LENGTH", 10)))
        if time_surface_yaml:
            with open(time_surface_yaml) as f:
                s = yaml.safe_load(f)
            cfg.surface = TimeSurfaceConfig(
                decay_sec=float(s.get("decay_ms", 30)) / 1000.0,
                ignore_polarity=bool(s.get("ignore_polarity", True)),
                median_blur_kernel_size=int(
                    s.get("median_blur_kernel_size", 1)),
                mode=("backward" if int(s.get("time_surface_mode", 0)) == 0
                      else "forward"))
        cfg.__post_init__()
        return cfg


def with_overrides(cfg: SystemConfig, overrides) -> SystemConfig:
    """Apply ``section.field=value`` override strings on top of a loaded
    config — the analogue of rosparam/launch-file per-run overrides
    (reference launch files remap single parameters over the YAML base,
    e.g. launch/system/system_rpg.launch:37-58). Values parse as YAML
    scalars. Unknown sections/fields raise with the valid choices."""
    import yaml

    groups: dict = {}
    sections = {f.name for f in dataclasses.fields(cfg)}
    for ov in overrides or []:
        key, sep, val = ov.partition("=")
        if not sep:
            raise ValueError(f"--set wants section.field=value, got {ov!r}")
        sec, sep2, field = key.partition(".")
        if not sep2 or sec not in sections:
            raise ValueError(
                f"unknown config section in {ov!r}; sections: "
                f"{sorted(sections)}")
        sub = getattr(cfg, sec)
        names = {f.name for f in dataclasses.fields(sub)}
        if field not in names:
            raise ValueError(
                f"unknown field {field!r} in section {sec!r}; fields: "
                f"{sorted(names)}")
        groups.setdefault(sec, {})[field] = yaml.safe_load(val)
    repl = {sec: dataclasses.replace(getattr(cfg, sec), **kv)
            for sec, kv in groups.items()}
    out = dataclasses.replace(cfg, **repl)
    out.__post_init__()
    return out
