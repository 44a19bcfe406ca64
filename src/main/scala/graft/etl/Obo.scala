package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OBO ontology scan (S11; reference obo.py:27-62 via obonet).
  *
  * OBO ontologies are dictionary-sized (≤ ~50k terms), so the flat-file
  * block parse runs driver-side and lands as two DataFrames — the
  * Parquet cache of the reference's gpickle cache. At 100 TB the
  * ontology is a broadcast dimension, never a fact table. */
object Obo {

  final case class Term(term_id: String, name: String, namespace: String,
                        obsolete: Boolean)
  final case class TermEdge(child_id: String, relation: String,
                            parent_id: String)

  /** Parse the `[Term]` stanzas of an OBO file. */
  def parse(text: String): (Seq[Term], Seq[TermEdge]) = {
    val stanzas = text.split("\n\\[").toSeq
    val termStanzas = stanzas.filter(_.startsWith("Term]"))
    val terms = Seq.newBuilder[Term]
    val edges = Seq.newBuilder[TermEdge]
    termStanzas.foreach { stanza =>
      val lines = stanza.linesIterator.drop(1).toSeq
      def field(k: String): Option[String] =
        lines.find(_.startsWith(s"$k: ")).map(_.drop(k.length + 2).trim)
      field("id").foreach { id =>
        terms += Term(id,
          field("name").orNull,
          field("namespace").orNull,
          field("is_obsolete").contains("true"))
        lines.filter(_.startsWith("is_a: ")).foreach { l =>
          val parent = l.drop("is_a: ".length).split("!").head.trim
          edges += TermEdge(id, "is_a", parent)
        }
        lines.filter(_.startsWith("relationship: ")).foreach { l =>
          l.drop("relationship: ".length).split("!").head.trim
            .split("\\s+") match {
            case Array(rel, parent) => edges += TermEdge(id, rel, parent)
            case _ => ()
          }
        }
      }
    }
    (terms.result(), edges.result())
  }

  /** S11: OBO file → (terms, term_edges) DataFrames; callers cache as
    * parquet (the reference's gpickle cache, obo.py:41-60). */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val (terms, edges) = parse(text)
    (terms.toDF(), edges.toDF())
  }
}
