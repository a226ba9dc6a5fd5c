package graft.corpus

import java.util.SplittableRandom

/** Deterministic per-language text generator. Word pools are weighted so
  * the Lang kernel's function-word evidence fires reliably (mirroring real
  * prose, where function words dominate).
  */
object TextGen {

  val languages: Vector[String] = Vector("en", "de", "fr", "es", "ru")

  private val pools: Map[String, (Vector[String], Vector[String])] = Map(
    // (function words — high frequency, content words — low frequency)
    "en" -> (Vector("the", "and", "of", "to", "a", "is", "in", "it", "that",
      "he", "his", "with", "are", "not", "by", "on", "have", "my", "for", "but"),
      Vector("woods", "village", "horse", "snow", "evening", "promises",
        "lake", "wind", "flake", "harness", "mistake", "farmhouse", "sleep",
        "winter", "shadow", "lantern", "meadow", "frost", "sound", "bells")),
    "de" -> (Vector("der", "die", "das", "und", "ist", "nicht", "ein", "im",
      "zu", "mit", "auf", "den", "er", "es", "wie", "sein", "noch", "am",
      "bei", "ich"),
      Vector("wald", "dorf", "pferd", "schnee", "abend", "glocken", "teich",
        "wind", "flocke", "jahr", "haus", "weg", "schlaf", "winter",
        "schatten", "laterne", "wiese", "frost", "klang", "stille")),
    "fr" -> (Vector("le", "la", "les", "de", "des", "du", "un", "une", "et",
      "est", "je", "il", "ne", "pas", "que", "qui", "ce", "dans", "par", "pour"),
      Vector("bois", "village", "cheval", "neige", "soir", "clochettes",
        "lac", "vent", "flocon", "promesses", "maison", "chemin", "sommeil",
        "hiver", "ombre", "lanterne", "prairie", "givre", "bruit", "calme")),
    "es" -> (Vector("el", "la", "los", "las", "de", "del", "un", "una", "y",
      "es", "en", "que", "se", "su", "sin", "con", "por", "para", "este", "mi"),
      Vector("bosque", "aldea", "caballo", "nieve", "tarde", "cencerro",
        "lago", "viento", "copo", "promesas", "casa", "camino", "sueño",
        "invierno", "sombra", "farol", "pradera", "escarcha", "sonido", "calma")),
    "ru" -> (Vector("и", "в", "не", "на", "я", "он", "его", "как", "мне",
      "что", "у", "но", "мой", "это", "по", "так"),
      Vector("лес", "село", "конь", "снег", "вечер", "бубенцы", "озеро",
        "ветер", "хлопья", "обещания", "дом", "путь", "сон", "зима",
        "тень", "фонарь", "луг", "мороз", "звук", "тишина")))

  /** One sentence: 6..14 words, ~55% function words, capitalized, period. */
  def sentence(rng: SplittableRandom, lang: String): String = {
    val (fn, content) = pools(lang)
    val n = 6 + rng.nextInt(9)
    val words = (0 until n).map { _ =>
      if (rng.nextInt(100) < 55) fn(rng.nextInt(fn.size))
      else content(rng.nextInt(content.size))
    }
    val s = words.mkString(" ")
    s.substring(0, 1).toUpperCase + s.substring(1) + "."
  }

  /** One paragraph of `sentences` sentences. */
  def paragraph(rng: SplittableRandom, lang: String, sentences: Int): String =
    (0 until sentences).map(_ => sentence(rng, lang)).mkString(" ")

  /** A short title-like line (3..6 words, Title Case). */
  def titleLine(rng: SplittableRandom, lang: String): String = {
    val (fn, content) = pools(lang)
    val n = 3 + rng.nextInt(4)
    (0 until n).map { k =>
      val w = if (k % 2 == 0) content(rng.nextInt(content.size)) else fn(rng.nextInt(fn.size))
      w.substring(0, 1).toUpperCase + w.substring(1)
    }.mkString(" ")
  }

  /** Poem-like stanza: `lines` lines of 4..8 words, no trailing period. */
  def stanza(rng: SplittableRandom, lang: String, lines: Int): Vector[String] = {
    val (fn, content) = pools(lang)
    Vector.tabulate(lines) { _ =>
      val n = 4 + rng.nextInt(5)
      (0 until n).map { _ =>
        if (rng.nextInt(100) < 50) fn(rng.nextInt(fn.size))
        else content(rng.nextInt(content.size))
      }.mkString(" ")
    }
  }
}
