package graft.io

import java.nio.file.Paths

/** Directory-taxonomy deriver — port of the pure string logic in
  * generic_tools/config_parser.py:45-192 (`ConfigFileHandler`): every
  * pipeline stage's output directory is a deterministic function of
  * config choices, so artifacts memoize across runs (Luigi file-target
  * semantics, SURVEY §3.1).
  */
final class ProjectPaths(cfg: Hocon.Config) {

  // config_parser.py:10-13
  val SubdirNoFeatureSelection = "no_feat_selection"
  val SubdirNoHpo = "no_hp_optimization"
  val SubdirBaggingOn = "bagging_on"
  val SubdirBaggingOff = "bagging_off"

  private def structure(key: String): String =
    cfg.getString(s"project_structure.$key")

  private def join(parts: String*): String =
    Paths.get(parts.head, parts.tail: _*).toString

  /** config_parser.py:45-63 */
  def featureGenerationDir(model: String): (String, String) = {
    val name = cfg.getString(s"modeling_settings.$model.name_feats_generation_dir")
    (name, join(structure("FEATURE_GENERATION_DIR"), name))
  }

  /** config_parser.py:65-92 */
  def featureSelectionDir(model: String, runFs: Boolean): (String, String) = {
    val (fgName, _) = featureGenerationDir(model)
    val outDir =
      if (runFs) {
        val method = cfg.getString(s"modeling_settings.$model.fs_method")
        val fsName = cfg.getString("features_selection.name_fs_dir")
        join(fgName, s"${method}_$fsName")
      } else join(fgName, SubdirNoFeatureSelection)
    (outDir, join(structure("FEATURE_SELECTION_DIR"), outDir))
  }

  /** config_parser.py:94-122 */
  def hpoDir(model: String, runFs: Boolean, runHpo: Boolean): (String, String) = {
    val (fsOut, _) = featureSelectionDir(model, runFs)
    val outDir =
      if (runHpo) {
        val method = cfg.getString(s"modeling_settings.$model.hpo_method")
        val hpoName = cfg.getString("hp_optimization.name_hpo_dir")
        join(model, fsOut, s"${method}_$hpoName")
      } else join(model, fsOut, SubdirNoHpo)
    (outDir, join(structure("HYPERPARAMS_OPTIM_DIR"), outDir))
  }

  /** config_parser.py:124-147 */
  def solutionDir(model: String, runFs: Boolean, runHpo: Boolean, runBagging: Boolean): (String, String) = {
    val (hpoOut, _) = hpoDir(model, runFs, runHpo)
    (hpoOut, join(structure("SOLUTION_DIR"), hpoOut,
      if (runBagging) SubdirBaggingOn else SubdirBaggingOff))
  }

  /** config_parser.py:149-152 */
  def singleModelFlags(model: String): (Boolean, Boolean, Boolean) = (
    cfg.getBool(s"modeling_settings.$model.run_fs"),
    cfg.getBool(s"modeling_settings.$model.run_hpo"),
    cfg.getBool(s"modeling_settings.$model.run_bagging"))

  /** config_parser.py:194-198 */
  def featuresInputDirForStacking: String =
    join(structure("FEATURE_GENERATION_DIR"),
      cfg.getString("modeling_settings.name_feats_generation_dir_for_stacker"))

  /** config_parser.py:200-222 */
  def stackedSolutionDir(stackerModel: String, runStackerHpo: Boolean,
      runBagging: Boolean): (String, String) = {
    val baseName = cfg.getString("stacker.name_stacking_dir")
    val provided = cfg.getBool("stacker.use_provided_oof_input_files")
    val dirName = s"${baseName}_${if (provided) "external" else "pipeline"}_oof_preds"
    val outDir =
      if (runStackerHpo) {
        val method = cfg.getString(s"stacker.$stackerModel.hpo_method")
        val hpoName = cfg.getString("hp_optimization.name_hpo_dir")
        join(dirName, stackerModel, s"${method}_$hpoName")
      } else join(dirName, stackerModel, SubdirNoHpo)
    (outDir, join(structure("ENSEMBLE_DIR"), structure("STACKER_SUBDIR"), outDir,
      if (runBagging) SubdirBaggingOn else SubdirBaggingOff))
  }

  /** config_parser.py:224-228 */
  def stackerFlags(stackerModel: String): (Boolean, Boolean) = (
    cfg.getBool(s"stacker.$stackerModel.run_hpo"),
    cfg.getBool(s"stacker.$stackerModel.run_bagging"))

  /** config_parser.py:266-281 */
  def blendedSolutionDir(blendingMethod: String): (String, String) = {
    val baseName = cfg.getString("blender.name_blending_dir")
    val provided = cfg.getBool("blender.use_provided_oof_input_files")
    val outDir = s"${baseName}_${if (provided) "external" else "pipeline"}_oof_preds"
    (outDir, join(structure("ENSEMBLE_DIR"), structure("BLENDER_SUBDIR"),
      blendingMethod, outDir))
  }

  /** config_parser.py:154-192: per-model parameter bundle for the task DAG. */
  def singleModelParameters: Seq[Map[String, String]] = {
    val models: Seq[String] = cfg.getStringList("modeling_settings.models")
    models.map { model =>
      val (runFs, runHpo, runBagging) = singleModelFlags(model)
      Map(
        "model" -> model,
        "run_feature_selection" -> runFs.toString,
        "run_hpo" -> runHpo.toString,
        "run_bagging" -> runBagging.toString,
        "fg_output_dir" -> featureGenerationDir(model)._2,
        "fs_output_dir" -> featureSelectionDir(model, runFs)._2,
        "hpo_output_dir" -> hpoDir(model, runFs, runHpo)._2,
        "solution_output_dir" -> solutionDir(model, runFs, runHpo, runBagging)._2)
    }
  }
}
