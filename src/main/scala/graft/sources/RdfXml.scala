package graft.sources

import scala.collection.mutable
import scala.xml.{Elem, Node, Text, XML}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A5: distributed RDF/XML triple extraction (SURVEY §2 A5).
  *
  * Re-expresses the reference's rdflib-based extractor
  * (Art-Knowledge-Graph-Local/ingestion/data_ingestion_batch.py:28-88):
  *  - keep only predicates whose local name is in KEEP_PREDICATES;
  *  - drop literals typed xsd:hexBinary;
  *  - resolve resource labels through SKOS.prefLabel → SKOS.altLabel →
  *    RDFS.label → DC.title → DCTERMS.title, falling back to the URI
  *    fragment (last '/' then '#' segment);
  *  - capture the literal language tag;
  *  - drop triples with a blank subject or object label; dedup per file.
  *
  * Spark-first: each file parses independently on an executor
  * (mapPartitions over the binaryFile source), label resolution is a
  * per-file in-memory map exactly like the reference's per-file rdflib
  * Graph — so a 100 TB corpus of files fans out embarrassingly parallel
  * with NO shuffle; the only shuffle is the optional global dedup the
  * caller may add. The parser covers the typed-node striped RDF/XML
  * subset (rdf:about / rdf:resource / nested nodes / xml:lang
  * inheritance / rdf:datatype), which is what EDM/Europeana data and
  * the reference's own samples use. Where rdflib picks an ARBITRARY
  * label among several candidates (g.value on a set), we pin FIRST IN
  * DOCUMENT ORDER — deterministic across runs and engines.
  */
object RdfXml {

  val keepPredicates: Set[String] =
    Set("prefLabel", "altLabel", "note", "isRelatedTo", "sameAs", "creator", "depicts")

  /** Label-resolution predicate local names, in precedence order (the
    * reference's LABEL_PREDICATES; dc:title and dcterms:title share the
    * local name "title" so one entry covers both). */
  private val labelPredicates = Seq("prefLabel", "altLabel", "label", "title")

  final case class RdfTriple(subject: String, xml_label: String, `object`: String, lang: String)

  private final case class Raw(subj: String, predLocal: String,
      objRef: Option[String], objLit: Option[String], lang: Option[String],
      datatype: Option[String])

  private val XmlNs = "http://www.w3.org/XML/1998/namespace"
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private def attr(e: Elem, ns: String, local: String): Option[String] =
    e.attributes.collectFirst {
      case a: scala.xml.PrefixedAttribute
        if a.key == local && Option(e.scope.getURI(a.pre)).contains(ns) =>
        a.value.text
    }

  private def fragment(uri: String): String = {
    val slash = uri.split("/").last
    slash.split("#").last
  }

  /** Parse one RDF/XML document into the reference's triple rows. */
  def parseFile(content: String): Seq[RdfTriple] = {
    val root = XML.loadString(content)
    var bnodeCounter = 0
    val raws = mutable.ArrayBuffer.empty[Raw]

    def nodeId(e: Elem): String =
      attr(e, RdfNs, "about").getOrElse {
        bnodeCounter += 1
        s"_:b$bnodeCounter"
      }

    // walk a resource node: emit one Raw per property element
    def walkResource(e: Elem, subj: String, inheritedLang: Option[String]): Unit = {
      val langHere = attr(e, XmlNs, "lang").orElse(inheritedLang)
      e.child.foreach {
        case p: Elem =>
          val pLang = attr(p, XmlNs, "lang").orElse(langHere)
          val resource = attr(p, RdfNs, "resource")
          val parseType = attr(p, RdfNs, "parseType")
          val nestedElems = p.child.collect { case c: Elem => c }
          if (resource.isDefined) {
            raws += Raw(subj, p.label, resource, None, None, None)
          } else if (parseType.contains("Resource")) {
            // rdf:parseType="Resource": the property's CHILDREN are
            // properties of an implicit blank node, not nested typed
            // nodes
            bnodeCounter += 1
            val bnode = s"_:b$bnodeCounter"
            raws += Raw(subj, p.label, Some(bnode), None, None, None)
            walkResource(p, bnode, pLang)
          } else if (nestedElems.nonEmpty) {
            // inline node object: property → nested resource, recurse
            nestedElems.foreach { c =>
              val childId = nodeId(c)
              raws += Raw(subj, p.label, Some(childId), None, None, None)
              walkResource(c, childId, pLang)
            }
          } else {
            val text = p.child.collect { case t: Text => t.data }.mkString
            raws += Raw(subj, p.label, None, Some(text),
              attr(p, XmlNs, "lang").orElse(langHere).filter(_.nonEmpty),
              attr(p, RdfNs, "datatype"))
          }
        case _ => ()
      }
    }

    root.child.foreach {
      case e: Elem => walkResource(e, nodeId(e), attr(root.asInstanceOf[Elem], XmlNs, "lang"))
      case _ => ()
    }

    // per-file label map: node id → first label literal in doc order,
    // by predicate precedence (prefLabel → altLabel → label → title)
    val labels: Map[String, String] = raws
      .filter(r => r.objLit.isDefined && labelPredicates.contains(r.predLocal))
      .groupBy(_.subj)
      .map { case (s, rs) =>
        val best = labelPredicates.iterator
          .flatMap(p => rs.find(r => r.predLocal == p).flatMap(_.objLit))
          .next()
        s -> best
      }

    def resolve(id: String): String =
      labels.getOrElse(id, if (id.startsWith("_:")) id else fragment(id))

    raws.iterator
      .filter(r => keepPredicates.contains(r.predLocal))
      .filterNot(r => r.datatype.exists(_.contains("hexBinary")))
      .map { r =>
        val objLabel = r.objLit.getOrElse(resolve(r.objRef.get))
        RdfTriple(resolve(r.subj), r.predLocal, objLabel, r.lang.orNull)
      }
      .filter(t => t.subject.trim.nonEmpty && t.`object`.trim.nonEmpty)
      .toSeq
      .distinct
  }

  /** Distributed extraction over a file glob: one task per file split,
    * no shuffle; dedup is per-file (reference parity).
    *
    * The glob is split into (dir, pathGlobFilter) instead of being
    * passed as the load path: a glob load path makes Spark's
    * FileStreamSink metadata probe stat the glob as a literal file
    * name and WARN-log a full FileNotFoundException stack through this
    * method — benign, but it made every bench/verify tail look like a
    * query failure (the r2/r3 "flaky bench" was exactly this noise). */
  /** A5 over IN-PLAN document strings (the synth-oracle face,
    * ing_rdf_synth): the SAME [[parseFile]] the wire face runs, minus
    * the binaryFile read that ing_rdf covers — what this face buys is
    * a DuckDB value oracle for the parser itself, which the real-file
    * face can never have (the expected triples of a formula-built
    * document are a formula). One flatMap per partition, no shuffle. */
  def rdfTriplesFromStrings(docs: org.apache.spark.sql.Dataset[String]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.mapPartitions(_.flatMap(parseFile)).toDF()
  }

  def rdfTriples(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val (dir, filter) = {
      val i = pathGlob.lastIndexOf('/')
      if (i >= 0 && pathGlob.drop(i + 1).exists("*?[".contains(_)))
        (pathGlob.take(i), Some(pathGlob.drop(i + 1)))
      else (pathGlob, None)
    }
    val reader = spark.read.format("binaryFile")
    filter.foreach(f => reader.option("pathGlobFilter", f))
    reader.load(dir)
      .select("content").as[Array[Byte]]
      .mapPartitions(_.flatMap { bytes =>
        parseFile(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      })
      .toDF()
  }
}
