package graft.catalog

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Property-based catalog invariants (ScalaCheck runs these through
  * sbt's native ScalaCheck framework — no scalatest bridge needed).
  * Generators build small random trees; each property runs real Spark
  * jobs, so the success count is kept low.
  */
object CatalogProperties extends Properties("FsCatalog") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  private val genTree: Gen[Seq[(String, Boolean, Long)]] = for {
    nDirs <- Gen.choose(1, 3)
    dirs = (0 until nDirs).map(i => s"/d$i")
    files <- Gen.listOfN(4, for {
      d <- Gen.oneOf(dirs)
      name <- Gen.identifier.map(_.take(6))
      size <- Gen.choose(0L, 100L)
    } yield (s"$d/$name", size))
  } yield ("/", true, 0L) +: dirs.map((_, true, 0L)) ++:
    files.distinctBy(_._1).map { case (p, s) => (p, false, s) }

  private def build(t: Seq[(String, Boolean, Long)]) =
    CatalogBuilder.fromEntries(spark, t)

  property("dus(root) equals the sum of all file sizes") =
    Prop.forAllNoShrink(genTree) { t =>
      val expected = t.filter(!_._2).map(_._3).sum
      build(t).dus("/").collect()(0).getLong(1) == expected
    }

  property("rename(a,b) then rename(b,a) restores the exact path set") =
    Prop.forAllNoShrink(genTree) { t =>
      val cat = build(t)
      val src = t.find(e => e._2 && e._1 != "/").get._1
      val (there, ok1) = cat.rename(src, "/zz-moved")
      val (back, ok2) = there.rename("/zz-moved", src)
      ok1 && ok2 &&
        back.inodes.collect().map(_.path).sorted.toSeq ==
          cat.inodes.collect().map(_.path).sorted.toSeq
    }

  property("recursive delete removes exactly the subtree") =
    Prop.forAllNoShrink(genTree) { t =>
      val cat = build(t)
      val victim = t.find(e => e._2 && e._1 != "/").get._1
      val inSub = t.count(e => e._1 == victim || e._1.startsWith(victim + "/"))
      val (after, ok) = cat.delete(victim, recursive = true)
      ok && after.inodes.count() == t.length - inSub
    }

  property("mkdirs is idempotent and creates every ancestor") =
    Prop.forAllNoShrink(Gen.listOfN(3, Gen.identifier.map(_.take(4)))) { segs =>
      val path = "/" + segs.mkString("/")
      val cat = CatalogBuilder.fromEntries(spark, Seq(("/", true, 0L)))
      val (c1, ok1) = cat.mkdirs(path)
      val (c2, ok2) = c1.mkdirs(path)
      ok1 && ok2 && c1.inodes.count() == c2.inodes.count() &&
        PathOps.ancestors(path).forall(c2.testD)
    }
}

/** Pure-string glob-translator invariants — no Spark jobs, so these run
  * at full ScalaCheck volume. The slash-star-matches-root defect lived
  * here; these pin the component-scoping rules it violated.
  */
object GlobProperties extends Properties("PathOps.glob") {

  private val genSeg: Gen[String] =
    Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty)

  private val genPath: Gen[String] = for {
    n <- Gen.choose(1, 4)
    segs <- Gen.listOfN(n, genSeg)
  } yield "/" + segs.mkString("/")

  property("a literal path matches exactly its own glob") =
    Prop.forAll(genPath, genPath) { (p, other) =>
      p.matches(PathOps.globToRegex(p)) &&
        (other == p || !other.matches(PathOps.globToRegex(p)))
    }

  property("'*' binds one component — never across '/'") =
    Prop.forAll(genPath, genSeg, genSeg) { (base, child, grandchild) =>
      val pattern = s"$base/*"
      val re = PathOps.globToRegex(pattern)
      s"$base/$child".matches(re) &&
        !s"$base/$child/$grandchild".matches(re) &&
        !base.matches(re) // the empty component must not satisfy '*'… of the parent
    }

  property("'?' matches exactly one in-component character") =
    Prop.forAll(genPath, genSeg) { (base, seg) =>
      val re = PathOps.globToRegex(s"$base/$seg?")
      s"$base/${seg}x".matches(re) &&
        !s"$base/$seg".matches(re) &&
        !s"$base/$seg/x".matches(re)
    }

  property("globLiteralPrefix prefixes every matching path") =
    Prop.forAll(genPath, genSeg) { (base, child) =>
      val pattern = s"$base/*"
      val matched = s"$base/$child"
      val pre = PathOps.globLiteralPrefix(pattern)
      pattern.startsWith(pre) && matched.startsWith(pre) &&
        !PathOps.isGlob(pre)
    }

  property("brace alternation matches each branch and nothing else") =
    Prop.forAll(genPath, genSeg, genSeg, genSeg) { (base, a, b, c) =>
      val re = PathOps.globToRegex(s"$base/{$a,$b}")
      s"$base/$a".matches(re) && s"$base/$b".matches(re) &&
        (c == a || c == b || !s"$base/$c".matches(re))
    }
}
