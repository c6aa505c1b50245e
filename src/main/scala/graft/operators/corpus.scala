package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Self-supervised corpus construction — the reference's "ETL"
 * (/root/reference/bertmap/corpora): synonym and nonsynonym text pairs
 * generated from the catalogs themselves, fully relational and seeded.
 *
 * All sampling is reproducible: `rand(seed)` columns + window row_number,
 * never driver-side RNG — the same job at any partition count yields the
 * same rows (determinism-under-parallelism is the BASELINE.json invariant).
 */
object corpus {

  /** Intra-catalog synonyms: all ordered pairs of distinct labels of one
    * class, both directions (intra_onto.py:61-76). `classes` must carry
    * (class_iri, labels: array<string>) with labels normalized. */
  def intraSynonyms(classes: DataFrame): DataFrame =
    classes
      .select(col("class_iri"), explode(col("labels")).as("sent1"), col("labels"))
      .select(col("sent1"), explode(col("labels")).as("sent2"))
      .filter(col("sent1") =!= col("sent2"))
      .withColumn("label", lit(1))
      .withColumn("kind", lit("syn"))

  /** Identity synonyms: every distinct label paired with itself, label 1
    * (basic_corpus.py:111-114). */
  def identitySynonyms(classes: DataFrame): DataFrame =
    classes
      .select(explode(col("labels")).as("sent1")).distinct()
      .select(col("sent1"), col("sent1").as("sent2"),
        lit(1).as("label"), lit("id_syn").as("kind"))

  /** Soft nonsynonyms: per label, `rate` random other-class labels, seeded;
    * rejected if the pair is already a synonym (intra_onto.py:78-107,
    * exclude_randrange general_utils.py:26-30 — the (idx+1+k)%D draw
    * guarantees a class ≠ self without re-drawing). */
  def softNonsynonyms(classes: DataFrame, rate: Int, seed: Long): DataFrame = {
    val d = classes.count()
    if (d < 2) return classes.sparkSession.emptyDataFrame
      .withColumn("sent1", lit("")).limit(0)
      .select(col("sent1"), col("sent1").as("sent2"), lit(0).as("label"), lit("soft_neg").as("kind"))
    val w = Window.orderBy("class_iri")
    val indexed = classes
      .withColumn("idx", row_number().over(w).cast("long") - 1)
    val byIdx = indexed.select(col("idx").as("o_idx"), col("labels").as("o_labels"))

    // rate draws per (class, label): explode a draw dimension, derive the
    // partner index without self via modular shift
    val draws = indexed
      .select(col("idx"), explode(col("labels")).as("sent1"))
      .withColumn("draw", explode(sequence(lit(0), lit(rate - 1))))
      .withColumn("r", floor(rand(seed) * (d - 1)).cast("long"))
      .withColumn("o_idx", (col("idx") + lit(1L) + col("r")) % lit(d))
      .join(byIdx, "o_idx")
      .withColumn("pick",
        (floor(rand(seed + 1) * size(col("o_labels"))) + 1).cast("int"))
      .withColumn("sent2", element_at(col("o_labels"), col("pick")))
      .select(col("sent1"), col("sent2"))
      .filter(col("sent1") =!= col("sent2"))

    // negative_sample_check (basic_corpus.py:141-153): not a synonym in
    // either direction
    val syn = intraSynonyms(classes).select("sent1", "sent2")
    val synBoth = syn.unionByName(syn.select(col("sent2").as("sent1"), col("sent1").as("sent2")))
    draws.join(synBoth, Seq("sent1", "sent2"), "left_anti")
      .withColumn("label", lit(0))
      .withColumn("kind", lit("soft_neg"))
  }

  /** Hard nonsynonyms: label pairs across sibling classes of a common
    * parent (intra_onto.py:109-151). `edges`: (child_iri, parent_iri). */
  def hardNonsynonyms(classes: DataFrame, edges: DataFrame): DataFrame = {
    val sib = edges.as("a")
      .join(edges.as("b"), col("a.parent_iri") === col("b.parent_iri"))
      .filter(col("a.child_iri") < col("b.child_iri"))
      .select(col("a.child_iri").as("c1"), col("b.child_iri").as("c2"))
      .distinct()
    val lab = classes.select(col("class_iri"), explode(col("labels")).as("l"))
    val pairs = sib
      .join(lab.select(col("class_iri").as("c1"), col("l").as("sent1")), "c1")
      .join(lab.select(col("class_iri").as("c2"), col("l").as("sent2")), "c2")
      .select("sent1", "sent2")
      .filter(col("sent1") =!= col("sent2"))
    val syn = intraSynonyms(classes).select("sent1", "sent2")
    val synBoth = syn.unionByName(syn.select(col("sent2").as("sent1"), col("sent1").as("sent2")))
    pairs.join(synBoth, Seq("sent1", "sent2"), "left_anti")
      .withColumn("label", lit(0))
      .withColumn("kind", lit("hard_neg"))
  }

  /** Cross-catalog synonyms from seed mappings: all src-label × tgt-label
    * pairs, both directions (cross_onto.py:82-100). */
  def crossSynonyms(maps: DataFrame, srcClasses: DataFrame,
                    tgtClasses: DataFrame): DataFrame = {
    val s = srcClasses.select(col("class_iri").as("entity1"), explode(col("labels")).as("sent1"))
    val t = tgtClasses.select(col("class_iri").as("entity2"), explode(col("labels")).as("sent2"))
    val fwd = maps.join(s, "entity1").join(t, "entity2").select("sent1", "sent2")
    fwd.unionByName(fwd.select(col("sent2").as("sent1"), col("sent1").as("sent2")))
      .withColumn("label", lit(1))
      .withColumn("kind", lit("co_syn"))
  }

  /** Train/val/test split by seeded rand with ratio boundaries
    * (cross_onto.py:36-66; ratios 0.2/0.1/0.7 per config.json:17-19). */
  def split(maps: DataFrame, trainRatio: Double, valRatio: Double,
            seed: Long): DataFrame = {
    require(trainRatio + valRatio <= 1.0, "split ratios exceed 1 (cross_onto.py:50)")
    maps.withColumn("u", rand(seed))
      .withColumn("split",
        when(col("u") < trainRatio, "train")
          .when(col("u") < trainRatio + valRatio, "val")
          .otherwise("test"))
      .drop("u")
  }

  /** Negative-rate downsampling: keep `negRate × nSyn` rows of a negative
    * set, seeded (cross_onto.py:153-174, merged_onto.py:96-147). */
  def downsampleNegatives(negatives: DataFrame, nSyn: Long, negRate: Double,
                          seed: Long): DataFrame = {
    val target = (negRate * nSyn).toLong
    val w = Window.orderBy(rand(seed))
    negatives.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= target).drop("rn")
  }

  /** Corpus counters (basic_corpus.py:95-109) as a tidy aggregate. */
  def counters(corpusLong: DataFrame): DataFrame =
    corpusLong.groupBy("kind").agg(count(lit(1)).as("n"))
}
