package graft.functions

/** Unit tables for Kusto's `convert_*` scalar family (convert_length,
  * convert_mass, convert_speed, convert_volume, convert_energy,
  * convert_angle, convert_force, convert_temperature). Unit names follow
  * ADX's (UnitsNet enum names, e.g. 'Meter', 'KilometerPerHour'); each
  * maps to its SI-base factor, so `convert(v, from, to) = v·f(from)/f(to)`
  * — pure literal arithmetic once the unit literals resolve at parse
  * time, which keeps the lowering a constant-folded multiply the oracle
  * replays exactly. Temperature is affine (offsets) and handled
  * separately. Unknown units are a parse-time error, not a runtime null —
  * a typo'd unit is a query bug, not a data error.
  */
object UnitConvert {

  val factors: Map[String, Map[String, Double]] = Map(
    "length" -> Map(
      "Millimeter" -> 0.001, "Centimeter" -> 0.01, "Decimeter" -> 0.1,
      "Meter" -> 1.0, "Kilometer" -> 1000.0,
      "Inch" -> 0.0254, "Foot" -> 0.3048, "Yard" -> 0.9144,
      "Mile" -> 1609.344, "NauticalMile" -> 1852.0),
    "mass" -> Map(
      "Milligram" -> 1e-6, "Gram" -> 0.001, "Kilogram" -> 1.0,
      "Tonne" -> 1000.0, "Ounce" -> 0.028349523125,
      "Pound" -> 0.45359237, "Stone" -> 6.35029318),
    "speed" -> Map(
      "MeterPerSecond" -> 1.0, "KilometerPerHour" -> (1.0 / 3.6),
      "MilePerHour" -> 0.44704, "Knot" -> (1852.0 / 3600.0),
      "FootPerSecond" -> 0.3048),
    "volume" -> Map(
      "CubicMeter" -> 1.0, "Liter" -> 0.001, "Milliliter" -> 1e-6,
      "CubicFoot" -> 0.028316846592, "CubicInch" -> 1.6387064e-5,
      "UsGallon" -> 0.003785411784, "ImperialGallon" -> 0.00454609),
    "energy" -> Map(
      "Joule" -> 1.0, "Kilojoule" -> 1000.0, "Calorie" -> 4.184,
      "Kilocalorie" -> 4184.0, "WattHour" -> 3600.0,
      "KilowattHour" -> 3.6e6, "BritishThermalUnit" -> 1055.05585262),
    "angle" -> Map(
      "Radian" -> 1.0, "Degree" -> (math.Pi / 180.0),
      "Gradian" -> (math.Pi / 200.0), "Revolution" -> (2.0 * math.Pi)),
    "force" -> Map(
      "Newton" -> 1.0, "Kilonewton" -> 1000.0,
      "PoundForce" -> 4.4482216152605, "KilogramForce" -> 9.80665,
      "Dyn" -> 1e-5))

  val temperatureUnits: Set[String] =
    Set("Kelvin", "DegreeCelsius", "DegreeFahrenheit")

  /** v in `unit` → Kelvin, as (scale, offsetBefore, offsetAfter):
    * K = (v + b) · s + a. */
  def toKelvin(unit: String): (Double, Double, Double) = unit match {
    case "Kelvin" => (1.0, 0.0, 0.0)
    case "DegreeCelsius" => (1.0, 273.15, 0.0)
    case "DegreeFahrenheit" => (5.0 / 9.0, 459.67, 0.0)
    case u => throw new IllegalArgumentException(u)
  }
}
