package graft.sources

import org.apache.spark.sql.DataFrame

import graft.core.{Source, SourceContext}

/** Source-trait adapters binding each pipeline to the warehouse + the
  * provenance contract (reference: each source module ships a Manager;
  * abstract_manager.py:53-301). Inputs are provided as DataFrame thunks so
  * the same adapter serves files, fixtures, or synthesized frames —
  * zero-egress parity with the reference's cached-download landing zone.
  */
final class IntactSource(raw: SourceContext => DataFrame,
                         mappings: SourceContext => Intact.Mappings)
  extends Source {
  val moduleName = "intact"
  val tables = Seq("interactions", "edges", "rejects")
  def populate(ctx: SourceContext): Unit = {
    val processed = Intact.processed(raw(ctx), mappings(ctx))
    ctx.write("interactions", processed)
    val (edges, rejects) = Intact.toBel(ctx.read("interactions"))
    ctx.write("edges", edges)
    ctx.write("rejects", rejects)
  }
}

final class BiogridSource(raw: SourceContext => DataFrame,
                          mappings: SourceContext => Biogrid.Mappings)
  extends Source {
  val moduleName = "biogrid"
  val tables = Seq("interactions", "edges")
  def populate(ctx: SourceContext): Unit = {
    ctx.write("interactions", Biogrid.processed(raw(ctx), mappings(ctx)))
    ctx.write("edges", Biogrid.toBel(ctx.read("interactions")))
  }
}

final class TfregulonsSource(raw: SourceContext => DataFrame,
                             hgnc: SourceContext => DataFrame)
  extends Source {
  val moduleName = "tfregulons"
  val tables = Seq("interactions", "edges")
  def populate(ctx: SourceContext): Unit = {
    ctx.write("interactions", Tfregulons.processed(raw(ctx), hgnc(ctx)))
    ctx.write("edges", Tfregulons.toBel(ctx.read("interactions")))
  }
}

/** A ComPath-style source materializing the pathway store (reference
  * sources/pid.py:269-294 populate shape). */
final class CompathSource(moduleNameArg: String,
                          store: SourceContext => graft.compath.PathwayStore)
  extends Source {
  val moduleName: String = moduleNameArg
  val tables = Seq("pathways", "proteins", "membership")
  def populate(ctx: SourceContext): Unit = {
    val s = store(ctx)
    ctx.write("pathways", s.pathways)
    ctx.write("proteins", s.proteins)
    ctx.write("membership", s.membership)
  }
  def queries(ctx: SourceContext): graft.compath.PathwayQueries =
    new graft.compath.PathwayQueries(graft.compath.PathwayStore(
      ctx.read("pathways"), ctx.read("proteins"), ctx.read("membership")))
}
