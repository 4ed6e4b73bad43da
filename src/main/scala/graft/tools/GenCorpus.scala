package graft.tools

import java.io.{BufferedWriter, FileWriter}

/** Deterministic large-corpus generator for throughput benchmarking:
  * expands the registry text format (same field lines the parser
  * matches) to N trials × 2-3 member-state records, ~2 KB/record —
  * the shape of the real ~2 GB registry dump at adjustable size.
  * Usage: runMain graft.tools.GenCorpus <path> <nTrials> */
object GenCorpus {

  def record(trial: Int, ms: Int, full: Boolean): String = {
    // the id is per-TRIAL: identical across member-state records, so
    // the merge has real work to do
    val id = f"20${10 + trial % 15}%02d-${trial}%06d-${10 + trial % 80}%02d"
    val sb = new StringBuilder
    sb ++= s"EudraCT Number: $id\n"
    sb ++= s"Trial Status: ${if (ms == 0) "Ongoing" else "Completed"}\n"
    if (full) {
      sb ++= s"Date on which this record was first entered in the EudraCT database: 20${10 + trial % 15}-0${1 + trial % 9}-1${trial % 9}\n"
      sb ++= s"A.3 Full title of the trial: Study Number $trial of Compound C${trial % 997} Versus Standard of Care in Condition ${trial % 89}\n"
      sb ++= s"A.4.1 Sponsor's protocol code number: PROTO-${trial}%-${ms}\n"
      sb ++= s"A.5.2 US NCT (ClinicalTrials.gov registry) number: NCT${10000000 + trial}\n"
    }
    sb ++= s"B.1.1 Name of Sponsor: Sponsor Organisation ${trial % 499}\n"
    sb ++= s"B.5.1 Name of organisation: Trials Unit ${trial % 211}\n"
    sb ++= s"B.5.2 Functional name of contact point: Clinical Operations Desk $ms\n"
    sb ++= s"B.5.6 E-mail: contact${trial % 499}@sponsor.example.org\n"
    sb ++= s"National Competent Authority: ${Seq("France", "Germany", "Italy", "Spain", "Austria", "Belgium")(ms % 6)} - NCA\n"
    sb ++= "D.IMP: 1\n"
    sb ++= s"D.2.1.1.1 Trade name: Tradename${trial % 1009} Forte\n"
    sb ++= s"D.3.1 Product name: Compound C${trial % 997}\n"
    sb ++= s"D.3.2 Product code: CC-${trial % 997}\n"
    if (trial % 3 == 0) {
      sb ++= "D.IMP: 2\n"
      sb ++= s"D.3.1 Product name: Comparator X${trial % 101}\n"
    }
    sb ++= s"D.8.1 Is a Placebo used in this Trial? ${if (ms == 0) "No" else "Yes"}\n"
    sb ++= s"E.1.1 Medical condition(s) being investigated: Chronic Condition Variant ${trial % 89} with complications\n"
    sb ++= "E.1.2 Version: 20.0\n"
    sb ++= s"E.1.2 Level: ${if (trial % 4 == 0) "SOC" else "PT"}\n"
    sb ++= s"E.1.2 Classification code: ${10000000 + trial % 50000}\n"
    sb ++= s"E.1.2 Term: Condition Term ${trial % 89}\n"
    sb ++= s"E.7.1 Human pharmacology (Phase I): ${if (trial % 5 == 0) "Yes" else "No"}\n"
    sb ++= s"E.7.2 Therapeutic exploratory (Phase II): ${if (trial % 3 == 0) "Yes" else "No"}\n"
    sb ++= s"E.7.3 Therapeutic confirmatory (Phase III): ${if (trial % 2 == 0) "Yes" else "No"}\n"
    sb ++= s"E.8.1.1 Randomised: Yes\n"
    sb ++= s"E.8.1.4 Double blind: ${if (trial % 2 == 0) "Yes" else "No"}\n"
    if (ms == 1) {
      sb ++= "E.8.6.3 If E.8.6.1 or E.8.6.2 are Yes, specify the regions in which trial sites are planned\n"
      sb ++= "United States\nJapan\nCanada\n"
      sb ++= "E.8.7 Trial has a data monitoring committee: Yes\n"
      sb ++= s"P. Date of the global end of the trial: 20${12 + trial % 13}-11-30\n"
    }
    sb ++= "F.2.1 Female: Yes\nF.2.2 Male: Yes\n"
    sb ++= s"F.4.2.2 In the whole clinical trial: ${100 + trial % 5000}\n"
    sb ++= ("X.9 Free text padding line to approximate real record bulk: " +
      s"lorem ipsum registry filler $trial $ms\n") * 8
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val n = args(1).toInt
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val w = new BufferedWriter(new FileWriter(path), 1 << 20)
    var page = 1
    for (t <- 1 to n) {
      if (t % 200 == 1) { w.write(s"### PAGE $page ####\n"); page += 1 }
      val nMs = 2 + t % 2
      for (ms <- 0 until nMs) w.write(record(t, ms, full = ms == 0))
    }
    w.close()
    println(s"WROTE $path ${new java.io.File(path).length() / 1e6} MB, $n trials")
  }
}
