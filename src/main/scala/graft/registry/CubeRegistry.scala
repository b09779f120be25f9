package graft.registry

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

import graft.engine.Browser
import graft.model.CubeModel

/** name → (model, DataFrame) registry — the Spark-native stand-in for the
  * reference's workspace/model.json loading (slicer.ini:1-2, generated at
  * assets_generator.py:616-642). Institutional cubes are registered as
  * filter-views over their parent cube (semantics identical to the
  * reference's verbatim row copies, assets_generator.py:696).
  */
final class CubeRegistry {
  private val cubes = TrieMap.empty[String, (CubeModel, DataFrame)]
  private val gen = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Monotonic registration generation: bumps on every register/unregister,
    * so response caches keyed on it self-invalidate across the
    * rebuild-redeploy reload cycle without coordination.
    */
  def generation: Long = gen.get()

  def register(model: CubeModel, df: DataFrame, cache: Boolean = false): Unit = {
    val d = if (cache) df.cache() else df
    cubes.put(model.name, (model, d))
    gen.incrementAndGet(): Unit
  }

  /** Drop every registration and unpersist whatever was cached — the
    * rebuild-redeploy reload hook (the reference's update_olap.sh:12-16
    * cycle restarts the server; we swap the registry contents in place).
    * Unpersist on a never-cached frame is a no-op, so this is safe across
    * mixed cached/view registrations.
    */
  def unregisterAll(): Unit = {
    cubes.values.foreach { case (_, df) => df.unpersist(blocking = false) }
    cubes.clear()
    gen.incrementAndGet(): Unit
  }

  // ---- workspace info blob (`GET /info`) --------------------------------

  @volatile private var infoBlob: String = "{}"

  /** The workspace metadata blob the cubes server exposes at `GET /info`
    * (slicer.ini:11 `info_file: info.json`) — served verbatim; `{}` until
    * an instance registers one. Setting it bumps the generation so the
    * HTTP response cache self-invalidates like any registry change.
    */
  def infoJson: String = infoBlob

  def setInfo(json: String): Unit = {
    infoBlob = json
    gen.incrementAndGet(): Unit
  }

  def names: Seq[String] = cubes.keys.toSeq.sorted
  def model(name: String): Option[CubeModel] = cubes.get(name).map(_._1)
  def browser(name: String): Browser = {
    val (m, df) = cubes.getOrElse(name,
      throw new NoSuchElementException(s"no such cube: $name"))
    new Browser(m, df)
  }

  /** `GET /cubes` (HOWTO.md:31-33). */
  def listJson: String =
    names.flatMap(model(_)).map(m =>
      s"""{"name":"${m.name}","label":"${if (m.label.nonEmpty) m.label else m.name}"}""")
      .mkString("[", ",", "]")
}
