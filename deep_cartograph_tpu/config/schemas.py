"""Pydantic v2 configuration schemas.

YAML-key-compatible with the reference toolkit's config surface
(deep_cartograph/yaml_schemas/*, defaults documented in default_config.yml) so
existing user configs validate unchanged against the TPU-native framework.
"""

from __future__ import annotations

from typing import Dict, List, Literal, Optional, Union

from pydantic import BaseModel, field_validator, model_validator


# ---------------------------------------------------------------------------
# compute_features (cf. reference yaml_schemas/compute_features.py:4-78)
# ---------------------------------------------------------------------------

class CoordinateGroup(BaseModel):
    selection: str = "not name H*"
    stride: int = 1


class DistanceGroup(BaseModel):
    first_selection: str = "not name H*"
    second_selection: str = "not name H*"
    first_stride: int = 1
    second_stride: int = 5
    skip_neigh_residues: bool = False
    skip_bonded_atoms: bool = True


class DihedralGroup(BaseModel):
    selection: str = "not name H*"
    periodic_encoding: bool = True
    search_mode: Literal["virtual", "protein_backbone", "real"] = "real"


class DistanceToCenterGroup(BaseModel):
    selection: str = "not name H*"
    center_selection: str = "not name H*"


class Features(BaseModel):
    coordinate_groups: Dict[str, CoordinateGroup] = {}
    distance_groups: Dict[str, DistanceGroup] = {}
    dihedral_groups: Dict[str, DihedralGroup] = {}
    distance_to_center_groups: Dict[str, DistanceToCenterGroup] = {}


class PlumedSettings(BaseModel):
    # Kept for config compatibility; on TPU this is the wall-clock budget for
    # the featurization engine rather than an external subprocess timeout.
    timeout: int = 172800
    traj_stride: int = 1
    features: Features = Features()


class PlumedEnvironment(BaseModel):
    # Only used when exporting/validating PLUMED inputs against a real PLUMED
    # binary; the TPU featurizer itself never shells out.
    bin_path: str = "plumed"
    kernel_path: Union[str, None] = None
    env_commands: List[str] = []


class EngineSettings(BaseModel):
    """TPU featurization engine knobs (new in the TPU-native framework)."""

    # Frames per device batch streamed HBM->VMEM during featurization.
    frame_chunk: int = 2048
    # Computation dtype on device ("float32" keeps parity with the reference).
    dtype: Literal["float32", "bfloat16"] = "float32"
    # Shard the frame axis over the device mesh when more than 1 device is present.
    shard_frames: bool = True
    # "auto" runs small trajectories on the host CPU (skips accelerator compile
    # latency); "default" always uses the default backend; "cpu" pins to host.
    device: Literal["auto", "default", "cpu"] = "auto"


class ComputeFeaturesSchema(BaseModel):
    plumed_settings: PlumedSettings = PlumedSettings()
    plumed_environment: PlumedEnvironment = PlumedEnvironment()
    engine: EngineSettings = EngineSettings()


# ---------------------------------------------------------------------------
# filter_features (cf. reference yaml_schemas/filter_features.py:4-29)
# ---------------------------------------------------------------------------

class FilterSettings(BaseModel):
    local_distance_threshold: Optional[float] = None
    diptest_significance_level: Optional[float] = 0.05
    entropy_quantile: Optional[float] = None
    std_quantile: Optional[float] = None
    # Boolean gates used throughout the reference's example/notebook configs.
    # The reference's own schema silently drops them (its notebooks therefore
    # run the dip test at 0.05 even with compute_diptest: False); here they
    # are honored: False disables that filter, True enables it with its
    # default threshold unless one is given explicitly.
    compute_diptest: Optional[bool] = None
    compute_entropy: Optional[bool] = None
    compute_std: Optional[bool] = None

    @model_validator(mode="after")
    def _apply_compute_gates(self):
        if self.compute_diptest is False:
            self.diptest_significance_level = None
        elif self.compute_diptest and self.diptest_significance_level is None:
            self.diptest_significance_level = 0.05
        if self.compute_entropy is False:
            self.entropy_quantile = None
        elif self.compute_entropy and self.entropy_quantile is None:
            self.entropy_quantile = 0.0
        if self.compute_std is False:
            self.std_quantile = None
        elif self.compute_std and self.std_quantile is None:
            self.std_quantile = 0.0
        return self


class SamplingSettings(BaseModel):
    num_samples: Union[int, None] = None
    total_num_samples: Union[int, None] = None
    relaxation_time: int = 1


class FilterFeaturesSchema(BaseModel):
    filter_settings: FilterSettings = FilterSettings()
    sampling_settings: SamplingSettings = SamplingSettings()


# ---------------------------------------------------------------------------
# train_colvars (cf. reference yaml_schemas/train_colvars.py:4-248)
# ---------------------------------------------------------------------------

class Optimizer(BaseModel):
    name: str = "Adam"
    kwargs: dict = {"lr": 1.0e-04, "weight_decay": 0.0}


class RLScheduler(BaseModel):
    name: str = "OneCycleLR"
    kwargs: dict = {}


class NeuralNetwork(BaseModel):
    layers: List[int] = [64, 32, 16]
    activation: List[
        Optional[
            Literal[
                "relu",
                "elu",
                "tanh",
                "softplus",
                "shifted_softplus",
                "custom_sigmoid",
                "leaky_relu",
                "linear",
            ]
        ]
    ] = ["leaky_relu", "leaky_relu", "leaky_relu"]
    batchnorm: List[bool] = [False, False, False]
    dropout: List[Optional[float]] = [None, None, None]
    last_layer_activation: Optional[
        Literal[
            "relu",
            "elu",
            "tanh",
            "softplus",
            "shifted_softplus",
            "custom_sigmoid",
            "leaky_relu",
            "linear",
        ]
    ] = None
    last_layer_batchnorm: bool = False
    last_layer_dropout: Optional[float] = None

    @field_validator("activation", "batchnorm", "dropout", mode="before")
    @classmethod
    def _broadcast_scalar(cls, v, info):
        """Accept a scalar and broadcast it across all hidden layers (the
        reference's shipped example configs use `dropout: 0.1` even though
        its schema only takes lists — accepted here for usability)."""
        if isinstance(v, list):
            return v
        layers = info.data.get("layers")
        return [v] * (len(layers) if layers else 3)


class Architecture(BaseModel):
    encoder: NeuralNetwork = NeuralNetwork()
    decoder: NeuralNetwork = NeuralNetwork()


class GeneralSettings(BaseModel):
    num_tries: int = 10
    seed: int = 42
    lengths: List[float] = [0.8, 0.2]
    batch_size: int = 32
    max_epochs: int = 1000
    shuffle: bool = False
    random_split: bool = True
    check_val_every_n_epoch: int = 10
    save_check_every_n_epoch: int = 10


class InputColvars(BaseModel):
    start: int = 0
    stop: Union[int, None] = None
    stride: int = 1


class EarlyStopping(BaseModel):
    patience: int = 20
    min_delta: float = 1.0e-05


class KLAnnealing(BaseModel):
    type: Literal["linear", "sigmoid", "cyclical"] = "linear"
    start_beta: float = 1e-06
    max_beta: float = 0.01
    start_epoch: int = 1000
    n_cycles: int = 4
    n_epochs_anneal: int = 5000


class Trainings(BaseModel):
    general: GeneralSettings = GeneralSettings()
    early_stopping: EarlyStopping = EarlyStopping()
    optimizer: Optimizer = Optimizer()
    lr_scheduler: Optional[RLScheduler] = None
    lr_scheduler_config: Optional[dict] = {
        "interval": "epoch",
        "monitor": "valid_loss",
        "frequency": 1,
    }
    kl_annealing: Optional[KLAnnealing] = None
    save_loss: bool = True
    plot_loss: bool = True
    model_to_save: Literal["best", "last"] = "best"


class BiasArgs(BaseModel):
    temperature: float = 300.0
    sigma: float = 0.05
    pace: int = 500
    grid_min: float = -1.0
    grid_max: float = 1.0
    grid_bin: int = 300
    height: float = 1.0
    bias_factor: float = 10.0
    barrier: float = 50.0
    observation_steps: int = 100
    compression_threshold: float = 0.1


class Bias(BaseModel):
    method: Literal[
        "wt_metadynamics", "opes_metad", "opes_metad_explore", "opes_expanded"
    ] = "opes_metad"
    args: BiasArgs = BiasArgs()
    add_rmsd_restraint: bool = False
    align_waypoint_structures: bool = True
    rmsd_restraint_k: float = 5000.0
    rmsd_restraint_eq: float = 0.4


class CommonCollectiveVariable(BaseModel):
    dimension: int = 2
    lag_time: int = 1
    tica_regularization: float = 1.0e-06
    features_normalization: Optional[
        Literal["mean_std", "min_max_range1", "min_max_range2"]
    ] = None
    input_colvars: InputColvars = InputColvars()
    architecture: Architecture = Architecture()
    training: Trainings = Trainings()
    num_subspaces: int = 10
    subspaces_dimension: int = 5
    n_neighbors: int = 15
    min_dist: float = 0.1
    metric: str = "euclidean"
    bias: Bias = Bias()
    # Larger-than-RAM training sets: "auto" streams when the estimated
    # matrix exceeds DEEP_CARTO_STREAM_BYTES; true/"on" forces streaming,
    # false/"off" disables (linear CVs only; see cv/linear.py).
    streaming: Union[bool, Literal["auto", "on", "off"]] = "auto"


class FesFigure(BaseModel):
    compute: bool = True
    save: bool = True
    temperature: int = 300
    bandwidth: float = 0.05
    num_fes_levels: int = 10
    num_bins: int = 150
    max_fes: float = 30


class TrajProjection(BaseModel):
    plot: bool = True
    num_bins: int = 100
    bandwidth: float = 0.25
    alpha: float = 0.8
    cmap: str = "turbo"
    marker_size: int = 5


class TrainFigures(BaseModel):
    fes: FesFigure = FesFigure()
    traj_projection: TrajProjection = TrajProjection()


class TrainColvarsSchema(BaseModel):
    cvs: List[
        Literal["pca", "ae", "tica", "htica", "deep_tica", "vae", "umap"]
    ] = ["pca", "ae", "tica", "htica", "deep_tica", "vae", "umap"]
    common: CommonCollectiveVariable = CommonCollectiveVariable()
    figures: TrainFigures = TrainFigures()

    # Allow per-CV override blocks (e.g. a top-level `pca:` key) which are
    # recursively merged over `common` at run time.
    model_config = {"extra": "allow"}


# ---------------------------------------------------------------------------
# traj_projection (cf. reference yaml_schemas/traj_projection.py:4-94)
# ---------------------------------------------------------------------------

class ProjFigures(BaseModel):
    fes: FesFigure = FesFigure()
    traj_projection: TrajProjection = TrajProjection()
    bias: Bias = Bias()


class TrajProjectionSchema(BaseModel):
    figures: ProjFigures = ProjFigures()


# ---------------------------------------------------------------------------
# traj_cluster (cf. reference yaml_schemas/traj_cluster.py:4-47)
# ---------------------------------------------------------------------------

class ClusterFigures(BaseModel):
    plot: bool = True
    num_bins: int = 100
    bandwidth: float = 0.25
    alpha: float = 0.8
    cmap: str = "turbo"
    marker_size: int = 5


class TrajClusterSchema(BaseModel):
    run: bool = True
    output_structures: Optional[Literal["centroids", "all"]] = "centroids"
    algorithm: Literal["kmeans", "hdbscan", "hierarchical"] = "hierarchical"
    opt_num_clusters: bool = True
    search_interval: List[int] = [3, 10]
    num_clusters: int = 10
    linkage: str = "complete"
    n_init: int = 20
    min_cluster_size: int = 5
    max_cluster_size: Union[int, None] = None
    min_samples: int = 3
    cluster_selection_epsilon: float = 0
    cluster_selection_method: Literal["eom", "leaf"] = "eom"
    figures: ClusterFigures = ClusterFigures()


# ---------------------------------------------------------------------------
# traj_augmentation (cf. reference yaml_schemas/traj_augmentation.py:4-24)
# ---------------------------------------------------------------------------

class TrajAugmentationSchema(BaseModel):
    num_frames: int = 1000
    keep_original_frames: bool = False
    interpolation_method: Optional[Literal["akima", "pchip"]] = "pchip"
    noise_std: Optional[float] = None
    random_seed: int = 42
    atom_selection: str = "all"
    traj_format: Literal["xtc", "dcd", "nc", "pdb"] = "xtc"
    prepare_trajectory: bool = False


# ---------------------------------------------------------------------------
# analyze_geometry (cf. reference yaml_schemas/analyze_geometry.py:5-51)
# ---------------------------------------------------------------------------

class RMSSettings(BaseModel):
    title: str
    selection: str = "protein and name CA"
    fit_selection: str = "protein and name CA"


class RMSDSettings(RMSSettings):
    title: str = "Protein Backbone RMSD"


class RMSFSettings(RMSSettings):
    title: str = "Protein Backbone RMSF"


class dRMSDSettings(BaseModel):
    title: str = "Protein Backbone dRMSD"
    selection: str = "protein and name CA"
    selection_stride: int = 5


class AnalysisList(BaseModel):
    RMSD: Dict[str, RMSDSettings] = {}
    RMSF: Dict[str, RMSFSettings] = {}
    dRMSD: Dict[str, dRMSDSettings] = {}


class AnalyzeGeometrySchema(BaseModel):
    analysis: AnalysisList = AnalysisList()
    dt_per_frame: float = 1.0
    run: bool = True


# ---------------------------------------------------------------------------
# Composite pipeline schema (cf. reference yaml_schemas/deep_cartograph.py:11-31)
# ---------------------------------------------------------------------------

class DeepCartograph(BaseModel):
    analyze_geometry: AnalyzeGeometrySchema = AnalyzeGeometrySchema()
    traj_augmentation: TrajAugmentationSchema = TrajAugmentationSchema()
    compute_features: ComputeFeaturesSchema = ComputeFeaturesSchema()
    filter_features: FilterFeaturesSchema = FilterFeaturesSchema()
    train_colvars: TrainColvarsSchema = TrainColvarsSchema()
    traj_projection: TrajProjectionSchema = TrajProjectionSchema()
    traj_cluster: TrajClusterSchema = TrajClusterSchema()
